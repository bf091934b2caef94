import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.optim import adabound, build_optimizer


def _minimize(tx, steps=300):
    """Minimize a quadratic; returns final params."""
    params = {"w": jnp.asarray([5.0, -3.0])}
    state = tx.init(params)

    def loss(p):
        return jnp.sum((p["w"] - jnp.asarray([1.0, 2.0])) ** 2)

    for _ in range(steps):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


@pytest.mark.parametrize("name", ["adam", "sgd", "adabound"])
def test_all_optimizers_converge(name):
    cfg = default_config(optim=name, lr=0.05, weight_decay=0.0)
    params = _minimize(build_optimizer(cfg))
    np.testing.assert_allclose(np.asarray(params["w"]), [1.0, 2.0], atol=0.05)


def test_adabound_step_bounds_tighten():
    tx = adabound(learning_rate=1.0, final_lr=0.1, gamma=1e-3)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0])}
    # early step: bound band is wide around final_lr
    up1, state = tx.update(grads, state, params)
    assert np.isfinite(float(up1["w"][0]))
    for _ in range(2000):
        _, state = tx.update(grads, state, params)
    upN, _ = tx.update(grads, state, params)
    # late steps: |update| ≤ ub(t) = final_lr * (1 + 1/(gamma*t)), t ≈ 2002
    t = 2002.0
    assert abs(float(upN["w"][0])) <= 0.1 * (1.0 + 1.0 / (1e-3 * t)) + 1e-6


def test_weight_decay_applied():
    cfg = default_config(optim="sgd", lr=0.1, weight_decay=0.5, beta1=0.0)
    tx = build_optimizer(cfg)
    params = {"w": jnp.asarray([2.0])}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([0.0])}, state, params)
    # zero grad: update = -lr * wd * w = -0.1*0.5*2 = -0.1
    np.testing.assert_allclose(float(updates["w"][0]), -0.1, rtol=1e-5)
