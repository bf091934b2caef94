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


# ---------------------------------------------------------------------------
# Fused stem v2: conv + BN + ReLU + 3×3/2 maxpool + s2d-layout c1 emission.
#
# Motivation (round 3): the chip behind this environment's relay measures
# ~140 GB/s HBM (scripts/exp_r3d.py) — the whole dense pass is
# bandwidth-bound. The v1 stem materializes c1 (H/2, W/2, 64) which is then
# re-read by the maxpool AND by the decoder's space_to_depth(c1) skip
# relayout (~800 MB of extra traffic ≈ 6 ms/slide). v2 restructures the
# input packing at QUARTER-resolution cells (4 pixels × 3 channels = 12
# elements on sublanes, W/4 cells on lanes) so ONE (336, W/4)ᵀ·(336, 128)
# matmul per output row yields the row as (W/4, 128) = [even-col 64ch |
# odd-col 64ch] — and the kernel emits:
#   * c1 as TWO s2d-layout halves out_e/out_o (H/4, W/4, 128) — rows 2P /
#     2P+1; ``concat([out_e, out_o], -1)`` IS ``space_to_depth(c1)``
#     (channel order (α·2+β)·64+c), consumed directly by the decoder skip;
#   * the 3×3/2 SAME maxpool (H/4, W/4, 64), computed in-kernel from the
#     f32 row accumulators (cross-block row reuse via a carry scratch;
#     edge padding by ZERO is exact because post-ReLU values are ≥ 0).
# Native c1 is never materialized.
#
# Mosaic constraints honored (probed): no value reshapes across the lane
# boundary, no concat of offset slices, no roll on non-32-bit data — the
# column shift for pooling uses an offset REF write instead.
# ---------------------------------------------------------------------------


def stem2_geometry(h_out: int, w_out: int):
    """(Hin, Wc4, padded Hout) for the v2 packing. ``w_out`` is the c1
    width (W/2); cells are w_out/2 = W/4 wide, lane-aligned to 128."""
    h_pad = h_out + (-h_out % _BR)
    wc4 = w_out // 2 + 2
    wc4 += -wc4 % 128
    return 2 * h_pad + 5, wc4, h_pad


def fold_stem_weights2(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                       mean, std, eps: float = 1e-5):
    """Like :func:`fold_stem_weights` but laid out for the v2 kernel:
    returns (w336 (336, 128), bias (1, 128)).

    Row 48·ky + 16·s + (3·pix + ch) ↦ tap (ky, dx) for the output parity β
    encoded in the column β·64 + co, where 2β + dx = 4s + pix (the input
    pixel's offset from the cell start). Bias duplicated per parity."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    s_ = 1.0 / (255.0 * std)
    t = -mean / std
    w = kernel.astype(jnp.float32)               # (7, 7, 3, 64)
    g = bn_scale * jax.lax.rsqrt(bn_var + eps)
    b = bn_bias - bn_mean * g
    w_scaled = (w * s_[None, None, :, None] * g[None, None, None, :])
    bias64 = jnp.einsum("yxc,yxco->o", jnp.broadcast_to(
        t, (7, 7, 3)), w) * g + b                # (64,)

    # scatter w_scaled[ky, dx, ch, co] → w336[48ky+16s+3pix+ch, 64β+co]
    dst_rows, dst_beta, src = [], [], []
    for ky in range(7):
        for beta in range(2):
            for dx in range(7):
                off = 2 * beta + dx              # 0..8
                sft, pix = divmod(off, 4)
                dst_rows.append(48 * ky + 16 * sft + 3 * pix)
                dst_beta.append(beta)
                src.append((ky, dx))
    w336 = jnp.zeros((336, 128), jnp.float32)
    for (ky, dx), row, beta in zip(src, dst_rows, dst_beta):
        w336 = w336.at[row:row + 3, 64 * beta:64 * beta + 64].add(
            w_scaled[ky, dx])
    bias = jnp.concatenate([bias64, bias64]).reshape(1, 128)
    return w336, bias


def _stem2_kernel(img_hbm, w_ref, b_ref, cmask_ref, s2d_ref,
                  pool_ref, scratch, bigbuf, accbuf, shiftbuf, carry,
                  sem, *, w4: int):
    i = pl.program_id(0)
    rows = 2 * _BR + 5

    def dma(step, slot):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(step * 2 * _BR, rows)], scratch.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()
        carry[:] = jnp.zeros_like(carry)
        shiftbuf[0:1] = jnp.zeros((1, 64), jnp.float32)

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    sc = scratch.at[i % 2]

    w = w_ref[:].astype(jnp.bfloat16)            # (336, 128)
    bias = b_ref[:]                              # (1, 128)
    wc4 = bigbuf.shape[1]

    # block-wide patch assembly (v3, exp_r6e: 5.06 → 4.35 ms standalone,
    # bit-identical): consecutive output rows (stride 2) share 5 of 7
    # input rows, so instead of rebuilding a (336, Wc4) patch per output
    # row (21 cast+roll+write sublane groups × 8 rows = 168/block), write
    # each of the block's 21 input rows ONCE with its three column shifts
    # (63 writes/block, 2.7× less VPU assembly). With input row ri at
    # bigbuf rows 48·ri + 16·s, output row y's patch is the CONTIGUOUS
    # slice bigbuf[96·y : 96·y + 336] (consecutive input rows 48 apart).
    for ri in range(rows):
        r = sc[ri].astype(jnp.int32)             # (16, Wc4)
        bigbuf[pl.ds(48 * ri, 16), :] = r.astype(jnp.bfloat16)
        for s_ in (1, 2):
            rolled = pltpu.roll(r, wc4 - s_, 1).astype(jnp.bfloat16)
            bigbuf[pl.ds(48 * ri + 16 * s_, 16), :] = rolled

    for y in range(_BR):
        acc = jax.lax.dot_general(
            bigbuf[pl.ds(96 * y, 336), 0:w4], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (w4, 128)
        v = jnp.maximum(acc + bias, 0.0)
        accbuf[y] = v
        # rows alternate into the even/odd lane halves of ONE s2d output:
        # channels [0:128] = even rows, [128:256] = odd — the tensor IS
        # space_to_depth(c1), no downstream concat materialization
        # (~800 MB/slide of canceled HBM traffic at bench geometry)
        s2d_ref[y // 2, :, 128 * (y % 2):128 * (y % 2) + 128] = \
            v.astype(jnp.bfloat16)

    # fused 3×3/2 SAME maxpool over the 8 fresh c1 rows (+1 carry row)
    cmask = cmask_ref[:]                         # (w4, 64) 0/1 f32
    for p in range(_BR // 2):
        rm1 = carry[:] if p == 0 else accbuf[2 * p - 1]
        rmax = jnp.maximum(jnp.maximum(rm1, accbuf[2 * p]),
                           accbuf[2 * p + 1])    # (w4, 128)
        e_ = rmax[:, 0:64]
        o_ = rmax[:, 64:128]
        # column -1 via offset ref write (rolls on f32 wedge the relay
        # chip; offset writes are the conv_chain-proven pattern). Row 0
        # of shiftbuf stays zero (exact: post-ReLU values are ≥ 0).
        shiftbuf[pl.ds(1, w4 - 1)] = o_[0:w4 - 1]
        om1 = shiftbuf[:]
        pool_ref[p] = jnp.maximum(jnp.maximum(om1, e_),
                                  o_ * cmask).astype(jnp.bfloat16)
    carry[:] = accbuf[_BR - 1]


@partial(jax.jit, static_argnames=("h_out", "w_out", "interpret"))
def stem_pool_conv(img12: jnp.ndarray, w336: jnp.ndarray,
                   bias: jnp.ndarray, h_out: int, w_out: int,
                   interpret: bool = False):
    """Fused stem v2 forward: normalize + 7×7/2 conv + BN + ReLU + s2d
    emission + 3×3/2 maxpool.

    img12: (Hin, 16, Wc4) uint8 per :func:`stem2_geometry` /
    :func:`pack_image2`. Returns (c1_s2d, pool):
      c1_s2d  (h_pad/2, w_out/2, 256) bf16 — ``space_to_depth(c1)``
              emitted directly (channels [0:128] even rows / [128:256]
              odd, each half [even-col 64 | odd-col 64], i.e. channel
              order (α·2+β)·64+c) — no host/XLA concat needed;
      pool    (h_pad/2, w_out/2, 64) bf16 — maxpool3x3/2(c1).
    """
    hin, wc4, h_pad = stem2_geometry(h_out, w_out)
    assert img12.shape[0] >= hin and img12.shape[2] >= wc4, (
        img12.shape, (hin, wc4))
    assert img12.shape[1] == 16, "pack to 16 sublanes (rows 12..15 zero)"
    assert h_out % _BR == 0 and w_out % 16 == 0
    w4 = w_out // 2
    n_blocks = h_pad // _BR

    # column edge mask: pool col q uses input cols {2q-1, 2q, 2q+1}; the
    # rightmost cell's odd column beyond w_out-1 must not contribute.
    # Cols < w_out always exist (w4 = w_out/2 exact), so the mask is all
    # ones — kept as an input for future partial-width use.
    cmask = jnp.ones((w4, 64), jnp.float32)

    half = h_pad // 2
    kern = partial(_stem2_kernel, w4=w4)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # img: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w336
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),      # cmask
        ],
        out_specs=(
            pl.BlockSpec((_BR // 2, w4, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR // 2, w4, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((half, w4, 256), jnp.bfloat16),
            jax.ShapeDtypeStruct((half, w4, 64), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * _BR + 5, 16, img12.shape[2]), jnp.uint8),
            pltpu.VMEM((48 * (2 * _BR + 5), img12.shape[2]),
                       jnp.bfloat16),                    # block patch buf
            pltpu.VMEM((_BR, w4, 128), jnp.float32),     # acc rows
            pltpu.VMEM((w4, 64), jnp.float32),           # col-shift buf
            pltpu.VMEM((w4, 128), jnp.float32),          # row carry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # the carry scratch requires SEQUENTIAL grid steps; the f32
            # acc buffer pushes past the default 16 MB scoped VMEM window
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img12, w336.astype(jnp.bfloat16), bias.astype(jnp.float32), cmask)


def pack_image2(img_u8: np.ndarray, h_out: int, w_out: int) -> np.ndarray:
    """Host-side v2 packing: (H, W, 3) uint8 (top-left aligned with the
    255-padded window start, as :func:`pack_image`) → (Hin, 16, Wc4):
    quarter-res cells of 4 pixels × 3 channels on sublanes (12 → 16
    padded), cells on lanes."""
    hin, wc4, _ = stem2_geometry(h_out, w_out)
    win = 4 * wc4
    h, w = img_u8.shape[:2]
    out = np.full((hin, win, 3), 255, np.uint8)
    out[:min(h, hin), :min(w, win)] = img_u8[:hin, :win]
    packed = np.zeros((hin, 16, wc4), np.uint8)
    packed[:, :12] = out.reshape(hin, wc4, 12).transpose(0, 2, 1)
    return packed


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
