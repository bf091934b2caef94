"""Pallas fused ResNet stem: uint8 → normalize → 7×7/2 conv → BN → ReLU.

The stem is the worst conv in the whole dense-inference pass: XLA lowers a
Cin=3 7×7/2 conv at slide scale to ~1.9 TFLOP/s (35 ms of a 150 ms Y-Net
forward at 3328×4352 — profiled, see CLAUDE.md), because a 3-channel
contraction can't tile onto the 128×128 MXU and every im2col/s2d
reformulation at the XLA level pays an input relayout that dominates
(round-1 negative results: 88-90 ms).

The fix is a Pallas kernel that performs the im2col *in VMEM*:

* the (padded) image is passed as (Hin, Wc, 6) uint8 — pixel pairs packed
  on the minor axis (a free host-side reshape), so an output pixel's 21
  row-taps (7 kx × 3 channels) sit in 4 consecutive sublanes;
* per output row, 7 input rows are expanded to a (Wout, 147) patch matrix
  with static sublane slices (no gather, no HBM relayout);
* one (Wout, 147) @ (147, 64) MXU matmul per row — contraction dim 147
  vs the logical 3 — with normalization folded into the weights
  (u8·s + t; the conv is linear) and BatchNorm+ReLU fused on the output.

Numerics: exact up to fp reassociation PROVIDED the caller pre-pads the
image with the background value 255 (the dense engine's FCN path already
carries a ≥128-px halo of 255s, so the 3-px stem support is interior).

Geometry contract (see :func:`stem_geometry`):
  input   (Hin, Wc, 6) uint8, Hin = 2·Hout + 5 + pad_to_block,
          Wc = Wout + 3  (i.e. Win = 2·Wout + 6)
  output  (Hout, Wout, 64) bfloat16, out[y, x] ← window at (2y, 2x)
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
    """Input dims required for an (h_out, w_out) output (before rounding
    h_out up to the row-block multiple)."""
    h_pad = -h_out % _BR
    hin = 2 * (h_out + h_pad) + 5
    wc = w_out + 3
    return hin, wc, h_out + h_pad


def _stem_kernel(img_hbm, w_ref, b_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    rows = 2 * _BR + 5
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * 2 * _BR, rows)], scratch, sem)
    dma.start()
    dma.wait()

    w = w_ref[:].astype(jnp.bfloat16)            # (147, 64)
    bias = b_ref[:]                              # (1, 64)
    wout = out_ref.shape[1]

    for y in range(_BR):
        parts = []
        for ky in range(7):
            r = scratch[2 * y + ky].astype(jnp.bfloat16)   # (Wc, 6)
            # P[x, 3kx+c] = row[6x + 3kx + c]: 4 shifted sublane slices
            p = jnp.concatenate(
                [r[0:wout], r[1:wout + 1], r[2:wout + 2], r[3:wout + 3]],
                axis=1)[:, :21]
            parts.append(p)
        x = jnp.concatenate(parts, axis=1)       # (Wout, 147)
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        out_ref[y] = jnp.maximum(acc + bias, 0.0).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("h_out", "w_out", "interpret"))
def stem_conv(img6: jnp.ndarray, w147: jnp.ndarray, bias: jnp.ndarray,
              h_out: int, w_out: int, interpret: bool = False):
    """Fused stem forward.

    img6: (Hin, Wc, 6) uint8 per :func:`stem_geometry` (Hin rows ≥
    2·ceil(h_out/BR)·BR + 5; extra rows ignored).
    Returns (h_out_padded, w_out, 64) bfloat16 — caller slices [:h_out].
    """
    hin, wc, h_pad = stem_geometry(h_out, w_out)
    assert img6.shape[0] >= hin and img6.shape[1] >= w_out + 3, (
        img6.shape, (hin, wc))
    n_blocks = h_pad // _BR

    out = pl.pallas_call(
        _stem_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # img: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w147
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias
        ],
        out_specs=pl.BlockSpec((_BR, w_out, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_out, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2 * _BR + 5, img6.shape[1], 6), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img6, w147.astype(jnp.float32), bias.astype(jnp.float32))
    return out


def pack_image(img_u8: np.ndarray, h_out: int, w_out: int) -> np.ndarray:
    """Host-side packing: (H, W, 3) uint8 (top-left aligned with the
    255-padded window start, i.e. img[0,0] is logical pixel (-3, -3) of the
    stem input) → (Hin, Wc, 6) with white padding to the geometry dims."""
    hin, wc, _ = stem_geometry(h_out, w_out)
    win = 2 * wc
    h, w = img_u8.shape[:2]
    out = np.full((hin, win, 3), 255, np.uint8)
    out[:min(h, hin), :min(w, win)] = img_u8[:hin, :win]
    return out.reshape(hin, wc, 6)
