"""Pallas fused ResNet stem: uint8 → normalize → 7×7/2 conv → BN → ReLU.

The stem is the worst conv in the whole dense-inference pass: XLA lowers a
Cin=3 7×7/2 conv at slide scale to ~1.9 TFLOP/s (35 ms of a 150 ms Y-Net
forward at 3328×4352 — profiled, see CLAUDE.md), because a 3-channel
contraction can't tile onto the 128×128 MXU and every im2col/s2d
reformulation at the XLA level pays an input relayout that dominates
(round-1 negative results: 88-90 ms).

The fix is a Pallas kernel that performs the im2col *in VMEM*:

* the (padded) image is passed as (Hin, 6, Wc) uint8 — each row stores its
  pixel-pairs transposed (element-of-cell on sublanes, cell index on
  lanes), a one-pass host repack, so the lane dim is ~W (no 128-lane
  padding waste) and the 21 row-taps of an output pixel are 21 sublanes;
* per output row, 7 input rows are written into a (147, Wc) patch scratch
  as 28 lane-rotated sublane groups (writing through a ref materializes
  the rotation — lane-offset concats are not supported by Mosaic);
* one (147, Wc)ᵀ-contraction MXU matmul per row against the folded
  (147, 64) weights — contraction dim 147 vs the logical 3 — with
  normalization folded into the weights (u8·s + t; the conv is linear)
  and BatchNorm+ReLU fused on the output.

Numerics: exact up to fp reassociation PROVIDED the caller pre-pads the
image with the background value 255 (the dense engine's FCN path already
carries a ≥128-px halo of 255s, so the 3-px stem support is interior).

Geometry contract (see :func:`stem_geometry`):
  input   (Hin, 6, Wc) uint8, Hin = 2·(Hout rounded up to 8) + 5,
          Wc = Wout + 3  (i.e. Win = 2·Wout + 6)
  output  (Hout_pad, Wout, 64) bfloat16, out[y, x] ← window at (2y, 2x)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output rows computed per grid step
_BR = 8


def fold_stem_weights(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                      mean, std, eps: float = 1e-5):
    """Fold normalize((u8/255 - mean)/std) + conv + BN into (w147, bias).

    conv(x·s + t) = conv_u8(w·s) + Σ_taps w·t  (linear);  BN folds to an
    affine y·g + b. Returns w147 (147, 64) and bias (1, 64), both f32.
    kernel: (7, 7, 3, 64) HWIO.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    s = 1.0 / (255.0 * std)                      # (3,)
    t = -mean / std                              # (3,)
    w = kernel.astype(jnp.float32)               # (7, 7, 3, 64)
    g = bn_scale * jax.lax.rsqrt(bn_var + eps)   # (64,)
    b = bn_bias - bn_mean * g
    w_scaled = w * s[None, None, :, None] * g[None, None, None, :]
    bias = jnp.einsum("yxc,yxco->o", jnp.broadcast_to(
        t, (7, 7, 3)), w) * g + b
    # t-ordering: t_idx = 21·ky + 3·kx + c  → natural reshape
    return w_scaled.reshape(147, 64), bias.reshape(1, 64)


def stem_geometry(h_out: int, w_out: int):
    """(Hin, Wc, padded Hout) for an (h_out, w_out) output. Wc (the cell /
    lane dim) is 128-aligned — Mosaic requires lane-aligned ref shapes."""
    h_pad = h_out + (-h_out % _BR)
    wc = w_out + 3
    wc += -wc % 128
    return 2 * h_pad + 5, wc, h_pad


def _stem_kernel(img_hbm, w_ref, b_ref, out_ref, scratch, patches, sem):
    i = pl.program_id(0)
    rows = 2 * _BR + 5

    # double-buffered input pipeline: start step i+1's window DMA before
    # computing step i (the serial start→wait→compute version left the
    # DMA engine idle during the 8 row matmuls)
    def dma(step, slot):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(step * 2 * _BR, rows)], scratch.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    scratch = scratch.at[i % 2]

    w = w_ref[:].astype(jnp.bfloat16)            # (224, 64)
    bias = b_ref[:]                              # (1, 64)
    wout = out_ref.shape[1]
    wc = scratch.shape[2]

    for y in range(_BR):
        # patches[32·ky + 8·s + e, x] = img[2y+ky, e, x+s]; all sublane
        # groups are 8-aligned (Mosaic rejects 6-row slices of 8-tiled refs)
        for ky in range(7):
            r = scratch[2 * y + ky].astype(jnp.int32)    # (8, Wc)
            patches[pl.ds(32 * ky, 8), :] = r.astype(jnp.bfloat16)
            for s_ in (1, 2, 3):
                rolled = pltpu.roll(r, wc - s_, 1).astype(jnp.bfloat16)
                patches[pl.ds(32 * ky + 8 * s_, 8), :] = rolled
        x = patches[:, 0:wout]                   # (224, Wout) lane-aligned
        acc = jax.lax.dot_general(
            x, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Wout, 64)
        out_ref[y] = jnp.maximum(acc + bias, 0.0).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("h_out", "w_out", "interpret"))
def stem_conv(img6: jnp.ndarray, w147: jnp.ndarray, bias: jnp.ndarray,
              h_out: int, w_out: int, interpret: bool = False):
    """Fused stem forward.

    img6: (Hin, 6, Wc) uint8 per :func:`stem_geometry` / :func:`pack_image`.
    Returns (h_out_padded, w_out, 64) bfloat16 — caller slices [:h_out].
    """
    hin, wc, h_pad = stem_geometry(h_out, w_out)
    assert img6.shape[0] >= hin and img6.shape[2] >= wc, (
        img6.shape, (hin, wc))
    assert img6.shape[1] == 8, "pack to 8 sublanes (pad rows 6..7 zero)"
    assert w_out % 128 == 0, "w_out must be lane-aligned (multiple of 128)"
    n_blocks = h_pad // _BR

    # (147, 64) → (224, 64): row 32·ky + 8·s + e ← w147[21·ky + 6·s + e]
    # where valid (e < 6 and 6s+e < 21); zeros match pad rows / extra taps
    w224 = jnp.zeros((224, 64), jnp.float32)
    src_rows, dst_rows = [], []
    for ky in range(7):
        for s_ in range(4):
            for e in range(6):
                if 6 * s_ + e < 21:
                    dst_rows.append(32 * ky + 8 * s_ + e)
                    src_rows.append(21 * ky + 6 * s_ + e)
    w224 = w224.at[np.asarray(dst_rows)].set(
        w147.astype(jnp.float32)[np.asarray(src_rows)])

    out = pl.pallas_call(
        _stem_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # img: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w147
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias
        ],
        out_specs=pl.BlockSpec((_BR, w_out, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_out, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * _BR + 5, 8, img6.shape[2]), jnp.uint8),
            pltpu.VMEM((224, img6.shape[2]), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(img6, w224, bias.astype(jnp.float32))
    return out


def pack_image(img_u8: np.ndarray, h_out: int, w_out: int) -> np.ndarray:
    """Host-side packing: (H, W, 3) uint8 (top-left aligned with the
    255-padded window start, i.e. img[0,0] is logical pixel (-3, -3) of the
    stem input) → (Hin, 8, Wc): cell elements transposed onto sublanes
    (padded 6→8 — Mosaic slices need 8-row alignment), cells on lanes."""
    hin, wc, _ = stem_geometry(h_out, w_out)
    win = 2 * wc
    h, w = img_u8.shape[:2]
    out = np.full((hin, win, 3), 255, np.uint8)
    out[:min(h, hin), :min(w, win)] = img_u8[:hin, :win]
    packed = np.zeros((hin, 8, wc), np.uint8)
    packed[:, :6] = out.reshape(hin, wc, 6).transpose(0, 2, 1)
    return packed
