"""Classification/regression heads and gradient reversal.

Twins of reference models/models.py: Classifier = GAP + Linear (:20-38),
Regressor = GAP + Linear(n→n//4) + ReLU + Linear(n//4→out) (:41-58),
gradient-reversal function (:5-17).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class Classifier(nn.Module):
    num_classes: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) deepest encoder feature. Returns (B, num_classes)."""
        x = jnp.mean(x.astype(self.dtype), axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc")(x)
        return x.astype(jnp.float32)


class Regressor(nn.Module):
    num_outputs: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.mean(x.astype(self.dtype), axis=(1, 2))
        n = x.shape[-1]
        x = nn.Dense(n // 4, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_outputs, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        return x.astype(jnp.float32)


@jax.custom_vjp
def gradient_reversal(x, scale: float = 1.0):
    """Identity forward, -scale * grad backward (reference ReverseLayerF,
    models/models.py:5-17)."""
    return x


def _gr_fwd(x, scale):
    return x, scale


def _gr_bwd(scale, g):
    return (-scale * g, None)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)
