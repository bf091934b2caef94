"""Pallas small-Cout conv kernel (ops/pallas_conv) — interpreter-mode
correctness vs lax.conv (the driver's CPU environment has no TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.pallas_conv import conv3x3_small


def test_conv3x3_small_matches_lax(rng):
    x = jnp.asarray(rng.randn(70, 130, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x[None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b
    out = conv3x3_small(x, k, b, blk_h=16, blk_w=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_small_no_bias(rng):
    x = jnp.asarray(rng.randn(32, 64, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x[None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    out = conv3x3_small(x, k, blk_h=16, blk_w=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
