"""Inference-fast U-Net decoder: space-to-depth (s2d) tail.

The decoder's full-resolution stages dominate dense-inference time: on v5e
at 3328×4352, block4's two convs + the seg head are ~100 ms of a 174 ms
Y-Net forward because XLA's conv lowering collapses for few-channel convs
at large spatial extents (16-out 3×3 runs at ~2 TFLOP/s; 4-out at 0.4).

Fix: compute the tail in s2d(2) domain. For stride-1 3×3 convs the
transform is EXACT:

  out[2i+a, 2j+b, co] = Σ w[dy,dx,ci,co] · x[2i+a+dy-1, 2j+b+dx-1, ci]

re-indexed on 2×2 cells gives a 3×3 conv over s2d cells with weights

  W'[du+1, dx-cell, (α,β,ci), (a,b,co)] = w[2du+α-a+1, 2dv+β-b+1, ci, co]

(zero where the dy/dx index falls outside 0..2). Channel counts quadruple
(Cin → 4Cin, Cout → 4Cout), spatial dims halve — same FLOPs up to the
zero-structure, but the MXU runs at 4× the output-lane utilization, and
the preceding nearest 2× upsample becomes a free channel tile
(s2d(upsample2x(x)) = x repeated 4× on channels).

Measured: block4 + head drop from ~100 ms to ~25 ms (v5e, 3328×4352).

This path is inference-only (BatchNorm folded to affine) and reuses the
trained variables unchanged — weights are transformed on the fly (tiny
tensors, fused into the jit). Exact-parity with ``YNet.segment`` is tested
to fp tolerance.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.conv9 import conv9, conv_chain


def _run_layers(x, layers, *, br, wc, out_dtype=jnp.bfloat16,
                use_chain=True, interpret=False):
    """Apply a conv layer group: ONE fused chain kernel, or conv9 per
    layer (fallback while the chain lowering is tuned)."""
    if use_chain:
        return conv_chain(x, layers, br=br, wc=wc, out_dtype=out_dtype,
                          interpret=interpret)
    for li, (k, s, b, relu) in enumerate(layers):
        last = li + 1 == len(layers)
        x = conv9(x, k, s, b, relu=relu, br=br, wc=min(wc, 256),
                  out_dtype=out_dtype if last else jnp.bfloat16,
                  interpret=interpret)
    return x


def s2d_kernel_f(w, f: int):
    """(3, 3, Cin, Cout) → (3, 3, f²·Cin, f²·Cout) exact s2d(f)-domain
    kernel for a stride-1, pad-1 3×3 conv.

    Derivation: out[f·I+a_y, f·J+a_x, co] = Σ_d w[d] x[f·I+a+d-1]; writing
    the input index as cell (I+du, J+dv) and sub-position (b_y, b_x) with
    f·du + b_y = a_y + d_y - 1 gives du ∈ {-1, 0, 1} for any f ≥ 1 (3×3
    taps never reach past one neighboring cell). Channel packing matches
    :func:`space_to_depth`: s2d channel = (α·f + β)·C + c. Computed in
    numpy (host, tiny) so tracing stays cheap.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    # constant 0/1 routing tensor (numpy, static shapes); the traced weight
    # is mapped with one tiny einsum so this works under jit
    route = _s2d_route(f)
    out = jnp.einsum("yxuvio,yxcm->uvicom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, f * f * cin, f * f * cout)


def _s2d_route(f: int) -> np.ndarray:
    """(3, 3, 3, 3, f², f²) 0/1 tensor: tap (dy, dx) of the logical kernel
    → (cell offset du, dv; input sub-position; output sub-position)."""
    route = np.zeros((3, 3, 3, 3, f * f, f * f), np.float32)
    for a in range(f):                    # output sub-row
        for b in range(f):                # output sub-col
            for dy in range(3):
                sy = a + dy - 1           # logical row offset from cell row
                du, by = divmod(sy, f)    # input cell offset, sub-row
                if not (-1 <= du <= 1):
                    continue
                for dx in range(3):
                    sx = b + dx - 1
                    dv, bx = divmod(sx, f)
                    if not (-1 <= dv <= 1):
                        continue
                    route[dy, dx, du + 1, dv + 1,
                          by * f + bx, a * f + b] = 1.0
    return route


def s2d_kernel(w):
    """(3, 3, Cin, Cout) → (3, 3, 4·Cin, 4·Cout): :func:`s2d_kernel_f` at
    f = 2 (kept for compatibility with round-1 call sites/tests)."""
    return s2d_kernel_f(w, 2)


def upfold_kernel(w):
    """(3, 3, Cin, Cout) → (3, 3, Cin, 4·Cout): s2d(2)-domain kernel for
    ``conv(upsample2x(x))`` with the upsample folded away.

    ``s2d(upsample2x(x))`` repeats x on all four input sub-positions, so
    the four input-position blocks of :func:`s2d_kernel` collapse into one
    Cin-wide block by summation — the conv then reads x at CELL resolution
    directly (no 4× channel tile, 4× less input traffic). Exact transform
    of the reference decoder's nearest-up + 3×3 conv (smp Unet decoder
    block, train.py:29)."""
    route = _s2d_route(2).sum(axis=4)      # sum over input sub-positions
    out = jnp.einsum("yxuvo,yxcm->uvcom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, w.shape[2], 4 * w.shape[3])


def _upfold2_route() -> np.ndarray:
    """(3, 3, 3, 3, 4, 16) routing for :func:`upfold2_kernel`: logical tap
    (dy, dx) → (cell tap du, dv; s2d(2) input sub-position; s2d(4) output
    sub-position)."""
    route = np.zeros((3, 3, 3, 3, 4, 16), np.float32)
    for a in range(4):
        for b in range(4):
            for dy in range(3):
                du, al = divmod((a + dy - 1) // 2, 2)
                if not (-1 <= du <= 1):
                    continue
                for dx in range(3):
                    dv, be = divmod((b + dx - 1) // 2, 2)
                    if not (-1 <= dv <= 1):
                        continue
                    route[dy, dx, du + 1, dv + 1, al * 2 + be,
                          a * 4 + b] = 1.0
    return route


def upfold2_kernel(w):
    """(3, 3, Cin, Cout) → (3, 3, 4·Cin, 16·Cout): exact kernel for
    ``conv3x3(upsample2x(x_half))`` taking ``x_half`` in s2d(2) layout to
    OUTPUT in s2d(4) layout — both on the SAME cell grid (quarter of the
    output resolution).

    Derivation: out[4I+a, 4J+b, co] = Σ w[dy,dx,ci,co]·u[4I+a+dy-1, …]
    with u = upsample2x(x_half), u[r, c] = x_half[r//2, c//2]; writing the
    half-res index as 2(I+du)+α gives s = ⌊(a+dy-1)/2⌋ = 2du+α, du ∈
    {-1, 0, 1} — a 3×3 cell-tap kernel. Combined with
    :func:`s2d_kernel_f`(·, 4) for the following convs this runs the
    full-resolution decoder tail at quarter-resolution cells with ≥128
    dense lanes (measured v5e: block4+head 25.9 → 21.8 ms at slide
    scale)."""
    cin, cout = w.shape[2], w.shape[3]
    route = _upfold2_route()
    out = jnp.einsum("yxuvio,yxcm->uvicom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, 4 * cin, 16 * cout)


def s2d_stride2_kernel(w):
    """(3, 3, Cin, Cout) stride-2 pad-1 conv → (2, 2, 4·Cin, Cout)
    stride-1 conv over s2d(2) cells with padding ((1, 0), (1, 0)).
    (The stem trick of fast_encoder.s2d_stem_kernel for 3×3 kernels —
    lets a stride-2 stage consume an s2d-layout activation directly.)"""
    cin, cout = w.shape[2], w.shape[3]
    route = np.zeros((3, 3, 2, 2, 4), np.float32)
    for dy in range(3):
        du, al = divmod(dy - 1, 2)
        for dx in range(3):
            dv, be = divmod(dx - 1, 2)
            route[dy, dx, du + 1, dv + 1, al * 2 + be] = 1.0
    out = jnp.einsum("yxuvi,yxcm->uvicm", jnp.asarray(route, w.dtype), w)
    return out.reshape(2, 2, 4 * cin, cout)


def space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/f, W/f, f²C); channel index (α·f+β)·C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, f * h, f * w, c)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2× upsample via broadcast (jax.image.resize's gather
    lowering is pathologically slow on TPU at slide scale)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _conv(x, kernel, stride=1):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn_affine(params, stats, eps=1e-5):
    """Inference BatchNorm as (scale', bias')."""
    inv = jax.lax.rsqrt(stats["var"] + eps)
    scale = params["scale"] * inv
    bias = params["bias"] - stats["mean"] * scale
    return scale, bias


def _tile4(v):
    """Per-channel vector → s2d channel layout (4 sub-positions × C)."""
    return jnp.tile(v, 4)


# s2d factor of the head logits that decode_cells(s2d_head=True) emits —
# the engine's planar postprocess interleaves f² position planes.
S2D_HEAD_F = 4


def decode_fast(variables, feats, dtype, s2d_head: bool = False):
    """U-Net decoder forward with the s2d(2) BLOCK4 tail — the
    tile-batch-friendly variant: blocks 0-3 in native layout, block4 +
    seg head at half resolution via upfold/s2d kernels.

    Use this for BATCHED tiles (the grid/streamed/sharded engine modes):
    at (128, 512², ·) the cell-domain tail of :func:`decode_cells` is
    ~35 ms/batch SLOWER (measured v5e, scripts/exp_r3c.py — the batched
    s2d/d2s transposes dominate), while at whole-slide batch-1 shapes
    decode_cells wins by ~25 ms. ``s2d_head=True`` returns (B, H/2, W/2,
    4·nc) s2d(2) logits without the final depth_to_space.

    Reference twin: smp Unet decoder dense eval (utils/eval.py:196-200).
    """
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]

    xx = feats[0].astype(dtype)
    skips = list(feats[1:]) + [None]

    # blocks 0..3 standard; nearest 2x via broadcast — resize's gather
    # lowering is slow at slide scale (see upsample2x docstring). NOTE:
    # splitting conv1 of the up+skip concat into two summed convs was
    # measured 3% SLOWER (XLA fuses the concat into the conv input).
    for i in range(4):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        xx = upsample2x(xx)
        if skips[i] is not None:
            xx = jnp.concatenate([xx, skips[i].astype(dtype)], axis=-1)
        for cj in (1, 2):
            y = _conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(dtype))
            s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
            xx = jax.nn.relu(y * s + t).astype(dtype)

    # block4 + seg head in s2d(2) at half resolution: conv1's 2x upsample
    # folds into its kernel (upfold)
    blk_p, blk_b = dp["block4"], db["block4"]
    k1 = upfold_kernel(blk_p["conv1"]["kernel"]).astype(dtype)
    y = _conv(xx, k1)
    s1, t1 = _bn_affine(blk_p["bn1"], blk_b["bn1"])
    xs = jax.nn.relu(y * _tile4(s1) + _tile4(t1)).astype(dtype)
    k2 = s2d_kernel(blk_p["conv2"]["kernel"]).astype(dtype)
    y = _conv(xs, k2)
    s2, t2 = _bn_affine(blk_p["bn2"], blk_b["bn2"])
    xs = jax.nn.relu(y * _tile4(s2) + _tile4(t2)).astype(dtype)

    head = dp["seg_head"]
    kh = s2d_kernel(head["kernel"]).astype(dtype)
    y = _conv(xs, kh) + _tile4(head["bias"].astype(jnp.float32))
    if s2d_head:
        return y.astype(jnp.float32)
    return depth_to_space(y).astype(jnp.float32)


def decode_cells(variables, feats, dtype, s2d_head: bool = False,
                 skip3_s2d=None):
    """U-Net decoder forward with the full cell-domain s2d tail — the
    WHOLE-SLIDE (batch-1, large spatial) variant. Spatial dims of the c1
    skip must be divisible by 4.

    The lane-starved stages (≤64 channels at ≥H/4 spatial) run at cell
    resolution with exactly transformed weights (all measured v5e at
    3072×4096, scripts/exp_r3a.py):

    * blocks 0-1: native layout (128-256 channels at ≤H/8 — XLA is fine);
    * block2 at H/8 cells in s2d(2) of its H/4 domain (17.8 → 11.6 ms):
      conv1 = upfold(up-path) ⊕ s2d(skip c2), conv2 = s2d;
    * block3 at H/4 cells in s2d(2) of its H/2 domain (33.1 → 19.0 ms);
    * block4 + seg head at H/4 cells in s2d(4) of the full resolution
      (25.9 → 21.8 ms): conv1 = upfold2 (s2d(2) in → s2d(4) out), conv2 +
      head = s2d(4) kernels. The 16× tap redundancy of the s2d(4) kernels
      costs less than the 16-lane starvation it removes.

    For BATCHED 512² tiles use :func:`decode_fast` instead (measured
    ~35 ms/batch faster there — scripts/exp_r3c.py).

    ``s2d_head=True`` returns the head logits in (B, H/4, W/4, 16·nc)
    s2d(4) layout without the final depth_to_space (the f32 full-res
    transpose costs ~23 ms at slide scale — the engine postprocesses in
    s2d space instead, `S2D_HEAD_F` position planes per class).

    ``skip3_s2d`` (B, H/4, W/4, 4·C1) supplies ``space_to_depth(c1)``
    directly (the fused v2 stem emits it; ``feats[4]`` may then be None).

    Reference twin: smp Unet decoder dense eval (utils/eval.py:196-200).
    """
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]

    xx = feats[0].astype(dtype)
    skips = list(feats[1:]) + [None]

    # blocks 0, 1 native; nearest 2x via broadcast — resize's gather
    # lowering is slow at slide scale (see upsample2x docstring). NOTE:
    # splitting conv1 of the up+skip concat into two summed convs was
    # measured 3% SLOWER (XLA fuses the concat into the conv input).
    for i in (0, 1):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        xx = upsample2x(xx)
        xx = jnp.concatenate([xx, skips[i].astype(dtype)], axis=-1)
        for cj in (1, 2):
            y = _conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(dtype))
            s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
            xx = jax.nn.relu(y * s + t).astype(dtype)

    # blocks 2, 3: s2d(2) cells of each block's native resolution; the 2×
    # upsample folds into conv1 (upfold) and the skip enters via its s2d
    # kernel on the space_to_depth'd skip. conv1 runs as TWO summed convs
    # (up-path + skip-path) instead of one conv over a channel concat: at
    # slide scale the concat materializes ~0.5 GB for block3 and the adds
    # fuse into the conv epilogue — measured v5e 3072×4096 in-graph
    # 44.4 → 41.2 ms on the stem+enc+b01+b23 truncation (scripts/
    # exp_r6a.py; full fwd 54.3 → ~51). NOTE: the native blocks 0-1 concat
    # measured the OPPOSITE (split 3% slower) — cell domain only.
    for i in (2, 3):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        cup = xx.shape[-1]
        w1 = blk_p["conv1"]["kernel"]
        s1, t1 = _bn_affine(blk_p["bn1"], blk_b["bn1"])
        k2 = s2d_kernel(blk_p["conv2"]["kernel"]).astype(dtype)
        s2, t2 = _bn_affine(blk_p["bn2"], blk_b["bn2"])
        if i == 3 and skip3_s2d is not None:
            sk = skip3_s2d.astype(dtype)
        else:
            sk = space_to_depth(skips[i].astype(dtype))
        y = _conv(xx, upfold_kernel(w1[:, :, :cup]).astype(dtype)) \
            + _conv(sk, s2d_kernel(w1[:, :, cup:]).astype(dtype))
        xs = jax.nn.relu(y * _tile4(s1) + _tile4(t1)).astype(dtype)
        y = _conv(xs, k2)
        xs = jax.nn.relu(y * _tile4(s2) + _tile4(t2)).astype(dtype)
        # block3's s2d(2) output feeds block4's upfold2 directly; block2
        # returns to native for block3's upfold conv1
        xx = depth_to_space(xs) if i == 2 else xs

    # block4 + seg head: s2d(4) cells (same grid as block3's s2d(2))
    blk_p, blk_b = dp["block4"], db["block4"]
    k1 = upfold2_kernel(blk_p["conv1"]["kernel"]).astype(dtype)
    y = _conv(xx, k1)
    s1, t1 = _bn_affine(blk_p["bn1"], blk_b["bn1"])
    xs = jax.nn.relu(y * jnp.tile(s1, 16) + jnp.tile(t1, 16)).astype(dtype)
    k2 = s2d_kernel_f(blk_p["conv2"]["kernel"], 4).astype(dtype)
    y = _conv(xs, k2)
    s2, t2 = _bn_affine(blk_p["bn2"], blk_b["bn2"])
    xs = jax.nn.relu(y * jnp.tile(s2, 16) + jnp.tile(t2, 16)).astype(dtype)

    head = dp["seg_head"]
    kh = s2d_kernel_f(head["kernel"], 4).astype(dtype)
    y = _conv(xs, kh) + jnp.tile(head["bias"].astype(jnp.float32), 16)
    if s2d_head:
        # planar logits in the COMPUTE dtype: at slide scale the f32
        # (H/4, W/4, 16·nc) head output is the single largest tensor and
        # this chip is HBM-bound (~140 GB/s measured) — bf16 halves its
        # write + the postprocess transpose read; the engine postprocess
        # upcasts to f32 before softmax (scripts/exp_r3d.py calibration)
        return y.astype(dtype)
    return depth_to_space(y, 4).astype(jnp.float32)


def decode_fold(variables, feats, dtype, *, br: int = 8, wc: int = 512,
                use_chain: bool = True, planar_head: bool = False,
                interpret: bool = False):
    """U-Net decoder forward with blocks 2–4 + head as fused Pallas
    conv-chain kernels in the s2d(2) domain (:func:`wsiseg_tpu.ops.conv9.
    conv_chain`): per block ONE input-window DMA, both convs (three for
    block4+head) VMEM-resident, one output write.

    STATUS — demoted, documented negative result (round 3). The fused
    chains were built to beat XLA's memory-bound per-conv lowering, but
    on v5e at slide scale they measure 73-92 ms for the blocks-2-4 region
    (Mosaic edge-mask + inter-kernel glue costs) while the pure-XLA
    s2d-cell-domain tail in :func:`decode_cells` runs the same region in
    ~45 ms in-graph — AND compiles in seconds instead of ~2-3 min per
    Pallas kernel through this environment's remote compile helper. The
    Pallas STEM (ops/pallas_stem) remains the production win (2.7× XLA at
    Cin=3, where the MXU cannot be fed by any layout); the chains stay
    in-tree as equality-tested kernels (engine ``fcn_fold`` opt-in,
    interpret-mode tests) and as the template for future fused epilogues.

    Numerically equivalent to :func:`decode_fast` up to fp reassociation
    (bf16 intermediates, f32 accumulation in both). Batch-1 only (the
    whole-slide FCN path); requires stage dims even (input dims divisible
    by 32). ``planar_head=True`` emits s2d(2) logits (4·nc channels) —
    NOT the s2d(4) layout of ``decode_cells(s2d_head=True)``; the engine
    postprocess derives the factor from the channel count. Reference
    twin: utils/eval.py:196-200 decoder dense eval.
    """
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]
    assert feats[0].shape[0] == 1, "decode_fold is batch-1 (FCN) only"

    xx = feats[0].astype(dtype)
    skips = list(feats[1:]) + [None]

    # blocks 0, 1: deep stages in native layout — XLA upsample+concat
    # (cheap at these dims), the conv pair as one fused chain
    for i in (0, 1):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        xx = upsample2x(xx)
        if skips[i] is not None:
            xx = jnp.concatenate([xx, skips[i].astype(dtype)], axis=-1)
        s1, t1 = _bn_affine(blk_p["bn1"], blk_b["bn1"])
        s2, t2 = _bn_affine(blk_p["bn2"], blk_b["bn2"])
        xx = _run_layers(
            xx[0].astype(dtype),
            [(blk_p["conv1"]["kernel"], s1, t1, True),
             (blk_p["conv2"]["kernel"], s2, t2, True)],
            br=br, wc=min(wc, 128), use_chain=use_chain,
            interpret=interpret)[None]

    def _affine(blk_p, blk_b, cj):
        s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
        return _tile4(s), _tile4(t)

    # blocks 2, 3: fused pairs at cell resolution; the 2× upsample is
    # folded into conv1 (upfold) and the skip enters via its s2d kernel
    x = xx[0]                                  # (H/8, W/8, 128) native
    for i in (2, 3):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        skip = skips[i][0].astype(dtype)       # full-res skip
        cup = x.shape[-1]
        w1 = blk_p["conv1"]["kernel"]
        k1 = jnp.concatenate([upfold_kernel(w1[:, :, :cup]),
                              s2d_kernel(w1[:, :, cup:])], axis=2)
        s1, t1 = _affine(blk_p, blk_b, 1)
        k2 = s2d_kernel(blk_p["conv2"]["kernel"])
        s2, t2 = _affine(blk_p, blk_b, 2)
        skip_s2d = space_to_depth(skip[None])[0]
        xin = jnp.concatenate([x, skip_s2d], axis=-1).astype(dtype)
        x = _run_layers(xin, [(k1, s1, t1, True), (k2, s2, t2, True)],
                        br=br, wc=wc, use_chain=use_chain,
                        interpret=interpret)
        if i < 3:
            x = depth_to_space(x[None])[0]     # native layout for next fold

    # block4 + seg head: fused trio at s2d cells of the full resolution
    blk_p, blk_b = dp["block4"], db["block4"]
    xd = depth_to_space(x[None])[0]            # (H/2, W/2, 16)
    k1 = upfold_kernel(blk_p["conv1"]["kernel"])
    s1, t1 = _affine(blk_p, blk_b, 1)
    k2 = s2d_kernel(blk_p["conv2"]["kernel"])
    s2, t2 = _affine(blk_p, blk_b, 2)
    head = dp["seg_head"]
    kh = s2d_kernel(head["kernel"])
    bh = _tile4(head["bias"].astype(jnp.float32))
    if planar_head:
        # emit (H/2, W/2, 4·nc) s2d logits WITHOUT the depth_to_space —
        # that transpose costs 23 ms at slide scale (4-lane f32 layout,
        # 35 GB/s); the engine postprocesses in s2d space instead. (A
        # planar in-kernel transpose variant exists in conv_chain but
        # its Mosaic compile never terminated — not used.)
        return _run_layers(xd.astype(dtype),
                           [(k1, s1, t1, True), (k2, s2, t2, True),
                            (kh, None, bh, False)],
                           br=br, wc=wc, out_dtype=jnp.float32,
                           use_chain=use_chain, interpret=interpret)
    y = _run_layers(xd.astype(dtype),
                    [(k1, s1, t1, True), (k2, s2, t2, True),
                     (kh, None, bh, False)],
                    br=br, wc=wc, out_dtype=jnp.float32,
                    use_chain=use_chain, interpret=interpret)
    return depth_to_space(y[None]).astype(jnp.float32)


def _conv0(x, kernel):
    """1×1 conv (VALID padding)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _block_diag_1x1(w, f2: int):
    """(1, 1, Cin, Cout) 1×1 kernel → (1, 1, f²·Cin, f²·Cout) s2d(f)-domain
    kernel. A 1×1 conv is position-independent, so in s2d layout (channel
    index p·C + c) it acts block-diagonally per sub-position p: the exact
    kernel is kron(I_{f²}, w)."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.kron(jnp.eye(f2, dtype=w.dtype), w.reshape(cin, cout))
    return k.reshape(1, 1, f2 * cin, f2 * cout)


def decode_linknet_cells(variables, feats, dtype, s2d_head: bool = True,
                         skip3_s2d=None):
    """Linknet decoder forward with blocks 3-4 + seg head in s2d cell
    domains — the WHOLE-SLIDE variant (batch 1, large spatial dims
    divisible by 4).

    The reference Linknet (smp defaults, myargs.py:9-10 model_name) runs
    its last two decoder blocks at H/2 and H with mid = in_ch//4 = 16
    channels — on TPU those convs are lane-starved (16 of 128 MXU lanes)
    and dominate dense-inference time (measured v5e 4,539 p/s vs Unet's
    10,480 before this path). Exact fix, mirroring
    :func:`decode_cells`:

    * blocks 0-2 native (≥32 channels at ≤H/4 — cheap);
    * block3 at H/4 cells: conv1 (1×1) native, up+conv2 via
      :func:`upfold_kernel`, conv3 (1×1) block-diagonal in s2d(2)
      (:func:`_block_diag_1x1`), residual skip add against
      ``space_to_depth(c1)`` — which the fused v2 stem already emits
      (``skip3_s2d``), so the skip costs zero relayout;
    * block4 + head at the SAME H/4 cells in s2d(4) of the full
      resolution: conv1 block-diag s2d(2), up+conv2 via
      :func:`upfold2_kernel` (s2d(2) in → s2d(4) out), conv3 block-diag
      s2d(4), head via :func:`s2d_kernel_f`.

    ``s2d_head=True`` emits (B, H/4, W/4, 16·nc) s2d(4) logits — the
    SAME ``S2D_HEAD_F`` plane contract as ``decode_cells(s2d_head=True)``,
    so the engine's planar postprocess, 2-bit label packing and
    multi-slide runners are shared unchanged.

    Numerically equivalent to the flax ``LinknetDecoder`` up to fp
    reassociation INCLUDING borders (measured max|Δ| 6.6e-7 f32 on a full
    64² tile): the cell-domain pad-1 reproduces logical SAME padding
    exactly — route entries for out-of-range logical taps are zero, so
    padded cells only contribute where the logical conv reads zeros.
    Reference twin: utils/eval.py:196-200 dense eval with the Linknet
    model selection.
    """
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]

    def _aff(blk_p, blk_b, cj, rep=1):
        s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
        return (jnp.tile(s, rep), jnp.tile(t, rep)) if rep > 1 else (s, t)

    xx = feats[0].astype(dtype)
    skips = list(feats[1:]) + [None]

    # blocks 0-2: native layout (conv1 1x1 -> up2 -> conv2 3x3 -> conv3 1x1
    # -> residual skip add, each BN'd; models/decoders.LinknetDecoderBlock)
    for i in (0, 1, 2):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
        y = _conv0(xx, blk_p["conv1"]["kernel"].astype(dtype))
        s, t = _aff(blk_p, blk_b, 1)
        xx = jax.nn.relu(y * s + t).astype(dtype)
        xx = upsample2x(xx)
        y = _conv(xx, blk_p["conv2"]["kernel"].astype(dtype))
        s, t = _aff(blk_p, blk_b, 2)
        xx = jax.nn.relu(y * s + t).astype(dtype)
        y = _conv0(xx, blk_p["conv3"]["kernel"].astype(dtype))
        s, t = _aff(blk_p, blk_b, 3)
        xx = jax.nn.relu(y * s + t).astype(dtype)
        xx = xx + skips[i].astype(dtype)

    # block3: H/4 cells, s2d(2) of its native H/2 output
    blk_p, blk_b = dp["block3"], db["block3"]
    y = _conv0(xx, blk_p["conv1"]["kernel"].astype(dtype))     # 1x1 @H/4
    s, t = _aff(blk_p, blk_b, 1)
    xx = jax.nn.relu(y * s + t).astype(dtype)
    y = _conv(xx, upfold_kernel(blk_p["conv2"]["kernel"]).astype(dtype))
    s, t = _aff(blk_p, blk_b, 2, rep=4)
    xx = jax.nn.relu(y * s + t).astype(dtype)
    y = _conv0(xx, _block_diag_1x1(blk_p["conv3"]["kernel"], 4).astype(dtype))
    s, t = _aff(blk_p, blk_b, 3, rep=4)
    xx = jax.nn.relu(y * s + t).astype(dtype)
    if skip3_s2d is None:
        skip3_s2d = space_to_depth(skips[3].astype(dtype))
    xx = xx + skip3_s2d.astype(dtype)

    # block4 + head: same H/4 cells, s2d(4) of the full resolution
    blk_p, blk_b = dp["block4"], db["block4"]
    y = _conv0(xx, _block_diag_1x1(blk_p["conv1"]["kernel"], 4).astype(dtype))
    s, t = _aff(blk_p, blk_b, 1, rep=4)
    xx = jax.nn.relu(y * s + t).astype(dtype)
    y = _conv(xx, upfold2_kernel(blk_p["conv2"]["kernel"]).astype(dtype))
    s, t = _aff(blk_p, blk_b, 2, rep=16)
    xx = jax.nn.relu(y * s + t).astype(dtype)
    y = _conv0(xx, _block_diag_1x1(blk_p["conv3"]["kernel"], 16).astype(dtype))
    s, t = _aff(blk_p, blk_b, 3, rep=16)
    xx = jax.nn.relu(y * s + t).astype(dtype)

    head = dp["seg_head"]
    kh = s2d_kernel_f(head["kernel"], 4).astype(dtype)
    y = _conv(xx, kh) + jnp.tile(head["bias"].astype(jnp.float32), 16)
    if s2d_head:
        return y.astype(dtype)        # see decode_cells: bf16 head write
    return depth_to_space(y, 4).astype(jnp.float32)


def unet_segment_fast(model, variables, x, dtype=None):
    """Y-Net encoder + U-Net decoder forward with the s2d tail.

    Numerically equivalent to ``model.apply(variables, x,
    method=YNet.segment)`` up to fp reassociation. Unet decoder only.
    """
    from wsiseg_tpu.models.ynet import YNet

    dtype = dtype or model.dtype
    # NOTE: an s2d-stem functional encoder exists (models/fast_encoder) but
    # measured SLOWER on v5e (stem 51→88 ms standalone: the s2d input
    # relayout dominates at Cin=3) — the flax encoder stays for this
    # BATCHED-TILE path (functional encode_stages with maxpool_s2d was
    # also measured ~7 ms/batch slower here, scripts/exp_r3c.py). The
    # PALLAS stem + functional encoder + decode_cells combination wins at
    # whole-slide shapes only; models/infer_fast uses it.
    feats = model.apply(variables, x, method=YNet.encode)
    return decode_fast(variables, feats, dtype)
