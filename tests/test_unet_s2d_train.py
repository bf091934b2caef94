"""Train-mode s2d decoder tail (unet.UNetDecoder(s2d_tail=True)) is an
EXACT, differentiable re-execution of the native decoder: same param/stat
trees, same outputs, same running-stat updates, same gradients.

Reference twin: smp Unet decoder training (train.py:29); the s2d tail is
the TPU-native execution of the same math (models/unet.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.models.unet import UNetDecoder


def _feats(rng, b=2, hw=64, dtype=jnp.float32):
    """Deepest-first resnet18-shaped pyramid for an hw² input."""
    shapes = [(b, hw // 32, hw // 32, 512), (b, hw // 16, hw // 16, 256),
              (b, hw // 8, hw // 8, 128), (b, hw // 4, hw // 4, 64),
              (b, hw // 2, hw // 2, 64)]
    keys = jax.random.split(rng, len(shapes))
    return [jax.random.normal(k, s, dtype) for k, s in zip(keys, shapes)]


@pytest.fixture(scope="module")
def setup():
    dec = UNetDecoder(num_classes=4, dtype=jnp.float32,
                      norm_dtype=jnp.float32)
    dec_s2d = UNetDecoder(num_classes=4, dtype=jnp.float32,
                          norm_dtype=jnp.float32, s2d_tail=True)
    feats = _feats(jax.random.PRNGKey(0))
    variables = dec.init(jax.random.PRNGKey(1), feats, train=False)
    return dec, dec_s2d, feats, variables


def test_param_tree_identical(setup):
    dec, dec_s2d, feats, variables = setup
    v2 = dec_s2d.init(jax.random.PRNGKey(1), feats, train=True)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert p1 == p2 and a.shape == b.shape


def test_train_forward_and_stats_exact(setup):
    dec, dec_s2d, feats, variables = setup

    y_ref, mut_ref = jax.jit(
        lambda v: dec.apply(v, feats, train=True,
                            mutable=["batch_stats"]))(variables)
    y_s2d, mut_s2d = jax.jit(
        lambda v: dec_s2d.apply(v, feats, train=True,
                                mutable=["batch_stats"]))(variables)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=0, atol=2e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut_ref),
            jax.tree_util.tree_leaves_with_path(mut_s2d)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-5, err_msg=str(pa))


def test_train_gradients_exact(setup):
    dec, dec_s2d, feats, variables = setup
    tgt = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 64, 64, 4), jnp.float32)

    def loss(m):
        def f(params):
            y, _ = m.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y - tgt))
        return f

    g_ref = jax.jit(jax.grad(loss(dec)))(variables["params"])
    g_s2d = jax.jit(jax.grad(loss(dec_s2d)))(variables["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_s2d)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5, err_msg=str(pa))


def test_eval_mode_uses_native_path(setup):
    """train=False must run the canonical decoder (engine fast paths handle
    inference); outputs equal either way by construction."""
    dec, dec_s2d, feats, variables = setup
    y1 = jax.jit(lambda v: dec.apply(v, feats, train=False))(variables)
    y2 = jax.jit(lambda v: dec_s2d.apply(v, feats, train=False))(variables)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=0, atol=0)


def test_nonstandard_channels_fall_back_native():
    """decoder_channels != 5 entries → native path, still trains."""
    dec_s2d = UNetDecoder(num_classes=4, decoder_channels=(64, 32, 16),
                          dtype=jnp.float32, norm_dtype=jnp.float32,
                          s2d_tail=True)
    feats = _feats(jax.random.PRNGKey(5), b=1, hw=64)
    v = dec_s2d.init(jax.random.PRNGKey(0), feats, train=True)
    y, _ = dec_s2d.apply(v, feats, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
