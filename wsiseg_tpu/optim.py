"""Optimizer factory: adam / sgd / adabound (reference models/optimizers.py:6-21).

Built on optax; AdaBound (Luo et al. 2019, "Adaptive Gradient Methods with
Dynamic Bound of Learning Rate") is implemented here as a first-class
GradientTransformation since optax ships none.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from wsiseg_tpu.config import Config


class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adabound(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
             final_lr: float = 0.1, gamma: float = 1e-3,
             eps: float = 1e-8) -> optax.GradientTransformation:
    """AdaBound: Adam whose per-parameter step size is clipped into a band
    [lb(t), ub(t)] that converges to ``final_lr`` (SGD-like) as t→∞."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBoundState(jnp.zeros([], jnp.int32), zeros,
                             jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        mu_hat_scale = 1.0 / (1 - b1 ** t)
        nu_hat_scale = 1.0 / (1 - b2 ** t)
        lb = final_lr * (1.0 - 1.0 / (gamma * t + 1.0))
        ub = final_lr * (1.0 + 1.0 / (gamma * t))

        def step(m, v):
            step_size = learning_rate / (jnp.sqrt(v * nu_hat_scale) + eps)
            step_size = jnp.clip(step_size, lb, ub)
            return -step_size * (m * mu_hat_scale)

        updates = jax.tree_util.tree_map(step, mu, nu)
        return updates, AdaBoundState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    """adam/sgd/adabound with the reference's hyperparameter wiring:
    adam(lr, betas, weight_decay) / sgd(lr, momentum=beta1, weight_decay)
    (models/optimizers.py:8-19)."""
    if cfg.optim == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2),
        )
    if cfg.optim == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(cfg.lr, momentum=cfg.beta1),
        )
    if cfg.optim == "adabound":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            adabound(cfg.lr, b1=cfg.beta1, b2=cfg.beta2),
        )
    raise KeyError(f"unknown optimizer {cfg.optim!r}")
