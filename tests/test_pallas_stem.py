"""Fused Pallas stem kernels (ops/pallas_stem), interpret mode on CPU.

v1 (stem_conv): normalize + 7×7/2 conv + BN + ReLU.
v2 (stem_pool_conv): v1 + 3×3/2 maxpool + s2d-layout c1 emission in ONE
kernel (round 3 — the relay chip is HBM-bound, so the fused variant saves
the c1 re-reads). Both checked against the plain XLA composition.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.models.fast_decoder import space_to_depth
from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights,
                                        fold_stem_weights2, pack_image,
                                        pack_image2, stem_conv,
                                        stem_pool_conv)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


@pytest.fixture(scope="module")
def stem_vars():
    r = np.random.RandomState(0)
    return dict(
        kernel=jnp.asarray(r.randn(7, 7, 3, 64).astype(np.float32) * 0.05),
        scale=jnp.asarray(r.rand(64).astype(np.float32) + 0.5),
        bias=jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
        mean=jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
        var=jnp.asarray(r.rand(64).astype(np.float32) + 0.5),
    )


def _canvas(r, h2, w2):
    """255-padded canvas with logical pixel (-3,-3) at the array origin."""
    img = r.randint(0, 255, (2 * h2 + 16, 2 * w2 + 16, 3)).astype(np.uint8)
    canvas = np.full((2 * h2 + 5, 2 * w2 + 6, 3), 255, np.uint8)
    canvas[3:, 3:] = img[: 2 * h2 + 2, : 2 * w2 + 3]
    return canvas


def _xla_stem(canvas, v, h2, w2):
    """Plain XLA reference of the fused stem math."""
    x = canvas.astype(np.float32) / 255.0
    x = (x - np.asarray(MEAN)) / np.asarray(STD)
    # canvas origin is logical (-3, -3) and the conv window of output
    # (0, 0) starts there → VALID conv over the pre-padded canvas
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], v["kernel"], (2, 2), [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :h2, :w2]
    g = v["scale"] * jax.lax.rsqrt(v["var"] + 1e-5)
    return jax.nn.relu(y * g + (v["bias"] - v["mean"] * g))


def test_stem_v1_matches_xla(stem_vars):
    r = np.random.RandomState(1)
    h2, w2 = 16, 128
    canvas = _canvas(r, h2, w2)
    ref = _xla_stem(canvas, stem_vars, h2, w2)

    w147, b = fold_stem_weights(stem_vars["kernel"], stem_vars["scale"],
                                stem_vars["bias"], stem_vars["mean"],
                                stem_vars["var"], MEAN, STD)
    got = stem_conv(jnp.asarray(pack_image(canvas, h2, w2)), w147, b,
                    h2, w2, interpret=True)[:h2]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_stem_v2_matches_v1_plus_pool_plus_s2d(stem_vars):
    """stem_pool_conv == (stem_conv, maxpool3x3/2, space_to_depth)."""
    r = np.random.RandomState(2)
    h2, w2 = 32, 128
    canvas = _canvas(r, h2, w2)

    w147, b1 = fold_stem_weights(stem_vars["kernel"], stem_vars["scale"],
                                 stem_vars["bias"], stem_vars["mean"],
                                 stem_vars["var"], MEAN, STD)
    c1 = stem_conv(jnp.asarray(pack_image(canvas, h2, w2)), w147, b1,
                   h2, w2, interpret=True)[:h2]
    pool_ref = nn.max_pool(c1[None], (3, 3), (2, 2),
                           padding=[(1, 1), (1, 1)])[0]
    s2d_ref = space_to_depth(c1[None].astype(jnp.float32))[0]

    w336, b2 = fold_stem_weights2(stem_vars["kernel"], stem_vars["scale"],
                                  stem_vars["bias"], stem_vars["mean"],
                                  stem_vars["var"], MEAN, STD)
    c1s2d, pool = stem_pool_conv(jnp.asarray(pack_image2(canvas, h2, w2)),
                                 w336, b2, h2, w2, interpret=True)
    s2d_got = c1s2d[: h2 // 2].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s2d_got), np.asarray(s2d_ref),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(pool[: h2 // 2], np.float32),
        np.asarray(pool_ref, np.float32), atol=2e-2, rtol=2e-2)
