"""Space-to-depth decoder tail (models/fast_decoder): exact parity with the
standard U-Net decoder path."""

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.fast_decoder import (depth_to_space, s2d_kernel,
                                            space_to_depth,
                                            unet_segment_fast)
from wsiseg_tpu.models.ynet import YNet, init_ynet


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_conv_exact(rng):
    """conv3x3(x) == d2s(conv3x3_s2d(s2d(x))) with transformed weights."""
    x = jnp.asarray(rng.randn(1, 16, 20, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    std = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_kernel(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(std), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_segment_fast_parity(rng):
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    ref = jax.jit(lambda v, a: model.apply(v, a, method=YNet.segment))(
        variables, x)
    fast = jax.jit(lambda v, a: unet_segment_fast(model, v, a))(variables, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               atol=1e-3, rtol=1e-3)


def test_segment_fast_parity_bottleneck(rng):
    """The s2d decoder tail is channel-generic: exact for a Bottleneck
    encoder's pyramid (2048/1024/512/256/64) too — the grid tile path
    (`engine._segment`) routes resnet50+Unet through decode_fast.
    Reference twin: train.py:29 smp.Unet('resnet50')."""
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32",
                         arch_encoder="resnet50")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(3))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = jax.jit(lambda v, a: model.apply(v, a, method=YNet.segment))(
        variables, x)
    fast = jax.jit(lambda v, a: unet_segment_fast(model, v, a))(variables, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               atol=1e-3, rtol=1e-3)


def test_decode_linknet_cells_parity(rng):
    """Linknet s2d cell-domain tail (blocks 3-4 + head at H/4 cells)
    matches the flax LinknetDecoder EXACTLY (incl. borders — the cell
    pad's route entries for out-of-range logical taps are zero, so SAME
    padding is reproduced bit-for-bit up to fp reassociation). Also
    checks the s2d(4) head layout inverts to the native logits."""
    from wsiseg_tpu.models.fast_decoder import decode_linknet_cells
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32",
                         model_name="Linknet")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(4))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, method=YNet.segment))(variables, x))
    feats = model.apply(variables, x, method=YNet.encode)
    fast = np.asarray(decode_linknet_cells(variables, feats, jnp.float32,
                                           s2d_head=False))
    np.testing.assert_allclose(ref, fast, atol=1e-4, rtol=1e-4)
    y_s2d = decode_linknet_cells(variables, feats, jnp.float32,
                                 s2d_head=True)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(y_s2d, 4)), fast, atol=1e-5, rtol=1e-5)


def test_upfold_kernel_exact(rng):
    """conv3x3(up2x(x)) == d2s(conv_s2d(x, upfold_kernel(w))): the upsample
    folds into the kernel with the input staying at cell resolution."""
    from wsiseg_tpu.models.fast_decoder import upfold_kernel, upsample2x
    x = jnp.asarray(rng.randn(1, 8, 10, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    std = jax.lax.conv_general_dilated(
        upsample2x(x), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = depth_to_space(jax.lax.conv_general_dilated(
        x, upfold_kernel(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(std), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_upfold2_kernel_exact(rng):
    """conv3x3(up2x(x_half)) with x_half in s2d(2) layout == d2s(4) of the
    upfold2 conv output (shared quarter-res cell grid)."""
    from wsiseg_tpu.models.fast_decoder import upfold2_kernel, upsample2x
    xh = jnp.asarray(rng.randn(1, 8, 12, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    std = jax.lax.conv_general_dilated(
        upsample2x(xh), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(xh), upfold2_kernel(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 4)
    np.testing.assert_allclose(np.asarray(std), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_s2d_kernel_f4_exact(rng):
    """conv3x3 in the s2d(4) domain equals the native conv."""
    from wsiseg_tpu.models.fast_decoder import s2d_kernel_f
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    std = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = depth_to_space(jax.lax.conv_general_dilated(
        space_to_depth(x, 4), s2d_kernel_f(w, 4), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 4)
    np.testing.assert_allclose(np.asarray(std), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_s2d_stride2_kernel_exact(rng):
    """Stride-2 pad-1 conv3x3 from an s2d(2)-layout input."""
    from wsiseg_tpu.models.fast_decoder import s2d_stride2_kernel
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    std = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fast = jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_stride2_kernel(w), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(std), np.asarray(fast),
                               atol=1e-4, rtol=1e-4)


def test_decode_cells_parity_and_s2d_head_layout(rng):
    """decode_cells (the whole-slide cell-domain tail) equals decode_fast
    (the tile-batch tail), and its s2d_head layout is s2d(S2D_HEAD_F)."""
    from wsiseg_tpu.models.fast_decoder import (S2D_HEAD_F, decode_cells,
                                                decode_fast)
    cfg = default_config(tile_w=64, tile_h=64, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(2))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    feats = model.apply(variables, x, method=YNet.encode)
    full = decode_fast(variables, feats, jnp.float32)
    cells = decode_cells(variables, feats, jnp.float32)
    np.testing.assert_allclose(np.asarray(cells), np.asarray(full),
                               atol=1e-4, rtol=1e-4)
    y_s = decode_cells(variables, feats, jnp.float32, s2d_head=True)
    assert y_s.shape == (1, 64 // S2D_HEAD_F, 64 // S2D_HEAD_F,
                         S2D_HEAD_F ** 2 * cfg.num_classes)
    np.testing.assert_allclose(np.asarray(depth_to_space(y_s, S2D_HEAD_F)),
                               np.asarray(full), atol=1e-4, rtol=1e-4)


def test_decode_fold_parity(rng):
    """Fused Pallas chain decode (decode_fold) matches decode_fast on a
    full Y-Net pyramid (interpret mode on CPU)."""
    from wsiseg_tpu.models.fast_decoder import decode_fast, decode_fold
    cfg = default_config(tile_w=64, tile_h=96, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(1, 96, 64, 3).astype(np.float32))
    feats = model.apply(variables, x, method=YNet.encode)
    ref = decode_fast(variables, feats, jnp.float32)
    got = decode_fold(variables, feats, jnp.float32, br=8, wc=16,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-3, rtol=2e-3)
