"""Inference-fast ResNet encoder: space-to-depth stem.

The 7×7 stride-2 stem conv dominates encoder time at slide scale (measured
v5e: 30 ms of a 47 ms ResNet-18 encoder at 3328×4352 — Cin=3 starves the
MXU). A stride-2 conv maps EXACTLY onto a stride-1 conv over the s2d(2)
input: output pixel (i, j) reads input rows 2i+dy-3, dy ∈ [0, 7); writing
r = 2(i+du)+α gives dy = 2du+α+3, valid du ∈ [-2, 1] — a 4×4 kernel over
(H/2, W/2, 12) cells whose output lands directly at the stem's natural
(H/2, W/2, 64) resolution. K grows 147→192 with far better MXU occupancy.

The remaining stages are re-implemented functionally (inference BatchNorm
as affine) from the SAME variables, so the fast path needs no re-training
or weight conversion. BasicBlock architectures only (resnet18/34); parity
with ``YNet.encode`` is tested to fp tolerance.

Status: NOT wired into the inference fast path — measured on v5e the s2d
stem is slower standalone (51 → 88 ms at 3328×4352: the space-to-depth
input relayout dominates at Cin=3, unlike the decoder tail where the
upsample→channel-tile is free). Kept as a parity-tested functional
encoder and the template for weight-transform experiments.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from wsiseg_tpu.models.fast_decoder import space_to_depth
from wsiseg_tpu.models.resnet import ENCODER_SPECS, BasicBlock


def s2d_stem_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, Cin, Cout) stride-2 kernel → (4, 4, 4·Cin, Cout) stride-1
    kernel over s2d(2) input. Channel packing (α·2+β)·Cin + c matches
    fast_decoder.space_to_depth."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7)
    out = jnp.zeros((4, 4, 4 * cin, cout), w.dtype)
    for alpha in range(2):
        for beta in range(2):
            for du in (-2, -1, 0, 1):
                dy = 2 * du + alpha + 3
                if not (0 <= dy <= 6):
                    continue
                for dv in (-2, -1, 0, 1):
                    dx = 2 * dv + beta + 3
                    if not (0 <= dx <= 6):
                        continue
                    ci0 = (alpha * 2 + beta) * cin
                    out = out.at[du + 2, dv + 2,
                                 ci0:ci0 + cin].set(w[dy, dx])
    return out


def _conv(x, kernel, stride=1, padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn_relu(y, params, stats, relu=True, eps=1e-5):
    inv = jax.lax.rsqrt(stats["var"] + eps)
    scale = params["scale"] * inv
    bias = params["bias"] - stats["mean"] * scale
    y = y * scale + bias
    return jax.nn.relu(y) if relu else y


def supports_fast_encode(model) -> bool:
    block_cls, _ = ENCODER_SPECS[model.arch]
    return block_cls is BasicBlock


def maxpool_s2d(c1: jnp.ndarray) -> jnp.ndarray:
    """3×3/2 SAME max-pool via the s2d(2) layout (separable row/col max
    over channel-group slices + one-cell shifts).

    ``nn.max_pool(c1, (3,3), (2,2), pad (1,1))`` lowers to a reduce_window
    that runs lane-starved at slide scale (7.8 ms for (1536, 2048, 64) on
    v5e); in s2d space the centered window [2p-1, 2p+1] is {cell p-1 pos 1,
    cell p pos 0, cell p pos 1} — three slices and a shift per axis. The
    s2d transpose is shared with the decoder's skip relayout by XLA CSE
    when both run in one jit. Exact math (max is separable)."""
    from wsiseg_tpu.models.fast_decoder import space_to_depth

    b, h, w, c = c1.shape
    xs = space_to_depth(c1)                  # (b, h/2, w/2, 4c)
    p00 = xs[..., 0 * c:1 * c]
    p01 = xs[..., 1 * c:2 * c]
    p10 = xs[..., 2 * c:3 * c]
    p11 = xs[..., 3 * c:4 * c]
    neg = jnp.finfo(c1.dtype).min

    def shift_down_rows(a):                  # a[p] ← a[p-1], -inf at p=0
        return jnp.concatenate(
            [jnp.full_like(a[:, :1], neg), a[:, :-1]], axis=1)

    def shift_right_cols(a):                 # a[q] ← a[q-1], -inf at q=0
        return jnp.concatenate(
            [jnp.full_like(a[:, :, :1], neg), a[:, :, :-1]], axis=2)

    # rows: max over in-rows {2p-1, 2p, 2p+1} for each col position
    r0 = jnp.maximum(jnp.maximum(shift_down_rows(p10), p00), p10)
    r1 = jnp.maximum(jnp.maximum(shift_down_rows(p11), p01), p11)
    # cols: max over in-cols {2q-1, 2q, 2q+1}
    return jnp.maximum(jnp.maximum(shift_right_cols(r1), r0), r1)


def maxpool_strided(x: jnp.ndarray) -> jnp.ndarray:
    """3×3/2 SAME max-pool as strided shifted maxes: rows are the
    untiled outer dim (free strided slices), cols pay three strided
    sublane slices. MEASURED NEGATIVE on v5e: grid 1446 -> 950 p/s and
    FCN 6829 -> 6343 (the strided sublane slices relayout worse than
    reduce_window); kept equality-tested as a documented experiment.
    (B, H, W, C), H and W even."""
    b, h, w, c = x.shape
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=neg)
    rm = jnp.maximum(jnp.maximum(xp[:, 0:h:2], xp[:, 1:h + 1:2]),
                     xp[:, 2:h + 2:2])            # (b, h/2, w, c)
    rp = jnp.pad(rm, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=neg)
    return jnp.maximum(jnp.maximum(rp[:, :, 0:w:2], rp[:, :, 1:w + 1:2]),
                       rp[:, :, 2:w + 2:2])


def _in_pad(kernel, c):
    """Zero-extend a conv kernel's input channels to match a lane-padded
    activation (padded channels are zero → exact math)."""
    ci = kernel.shape[2]
    if c > ci:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, c - ci), (0, 0)))
    return kernel


def _basic_block(ep, eb, xx, i, j, stride, dtype):
    p = ep[f"layer{i + 1}_{j}"]
    b = eb[f"layer{i + 1}_{j}"]
    identity = xx
    y = _conv(xx, _in_pad(p["conv1"]["kernel"],
                          xx.shape[-1]).astype(dtype), stride)
    y = _bn_relu(y, p["bn1"], b["bn1"]).astype(dtype)
    y = _conv(y, p["conv2"]["kernel"].astype(dtype))
    y = _bn_relu(y, p["bn2"], b["bn2"], relu=False)
    if "down_conv" in p:
        identity = _conv(xx, _in_pad(p["down_conv"]["kernel"],
                                     xx.shape[-1]).astype(dtype),
                         stride, padding=((0, 0), (0, 0)))
        identity = _bn_relu(identity, p["down_bn"], b["down_bn"],
                            relu=False)
    return jax.nn.relu(y + identity.astype(jnp.float32)).astype(dtype)


def _basic_block_resfold(ep, eb, xx, i, j, dtype):
    """Stride-1 BasicBlock with the residual FOLDED INTO the convs.

    Requires the block input to be element-wise non-negative (true for
    every layer1 block: inputs are maxpool/ReLU outputs), because the
    identity channels ride through conv1's ReLU unchanged only when
    relu(x) == x. Kernels become [w1 | I@center] (C→2C) and
    [w2·s2 ; I@center] (2C→C): one conv emits (bn1-affine conv1 | x),
    the next emits bn2(conv2)+x — the elementwise residual add and its
    extra HBM round-trip disappear, and the intermediate activation is
    2C dense lanes instead of a lane-padded C (this chip is HBM-bound:
    ~140 GB/s measured, scripts/exp_r3d.py). Exact math."""
    from wsiseg_tpu.models.fast_decoder import _bn_affine

    p = ep[f"layer{i + 1}_{j}"]
    b = eb[f"layer{i + 1}_{j}"]
    c = xx.shape[-1]
    eye = jnp.zeros((3, 3, c, c), jnp.float32).at[1, 1].set(jnp.eye(c))

    s1, t1 = _bn_affine(p["bn1"], b["bn1"])
    k1 = jnp.concatenate([p["conv1"]["kernel"] * s1, eye],
                         axis=3).astype(dtype)
    bias1 = jnp.concatenate([t1, jnp.zeros((c,), t1.dtype)])
    a = jax.nn.relu(_conv(xx, k1) + bias1).astype(dtype)

    s2, t2 = _bn_affine(p["bn2"], b["bn2"])
    k2 = jnp.concatenate([p["conv2"]["kernel"] * s2, eye],
                         axis=2).astype(dtype)
    return jax.nn.relu(_conv(a, k2) + t2).astype(dtype)


def _bottleneck_block(ep, eb, xx, i, j, stride, dtype):
    """Functional inference Bottleneck (resnet50/101/152): 1×1 reduce,
    3×3 (stride), 1×1 expand, each BN'd; projection shortcut on the first
    block of every stage (including layer1_0, where channels grow 64→256
    at stride 1). Mirrors ``models.resnet.Bottleneck`` — torchvision
    semantics, stride on conv2 (reference resnets_shift.py:219-242)."""
    p = ep[f"layer{i + 1}_{j}"]
    b = eb[f"layer{i + 1}_{j}"]
    identity = xx
    pt = ((0, 0), (0, 0))
    y = _conv(xx, _in_pad(p["conv1"]["kernel"],
                          xx.shape[-1]).astype(dtype), padding=pt)
    y = _bn_relu(y, p["bn1"], b["bn1"]).astype(dtype)
    y = _conv(y, p["conv2"]["kernel"].astype(dtype), stride)
    y = _bn_relu(y, p["bn2"], b["bn2"]).astype(dtype)
    y = _conv(y, p["conv3"]["kernel"].astype(dtype), padding=pt)
    y = _bn_relu(y, p["bn3"], b["bn3"], relu=False)
    if "down_conv" in p:
        identity = _conv(xx, _in_pad(p["down_conv"]["kernel"],
                                     xx.shape[-1]).astype(dtype),
                         stride, padding=pt)
        identity = _bn_relu(identity, p["down_bn"], b["down_bn"],
                            relu=False)
    return jax.nn.relu(y + identity.astype(jnp.float32)).astype(dtype)


def encode_stages(ep, eb, c1, stages, dtype, pooled=None,
                  bottleneck: bool = False):
    """Functional inference forward of the four ResNet stages, starting
    from the stem output ``c1``. Returns [c5, c4, c3, c2, c1].
    ``bottleneck=True`` runs Bottleneck blocks (resnet50/101/152).

    ``c1`` must be a genuine stem output (post-ReLU, non-negative): the
    BasicBlock layer1 runs residual-folded (:func:`_basic_block_resfold`),
    which is exact only for non-negative block inputs.

    The stem maxpool runs via :func:`maxpool_s2d` when dims allow: its
    internal ``space_to_depth(c1)`` is shared by XLA CSE with the decoder
    tail's block3 skip relayout when both run in one jit — measured v5e
    at 3072×4096 this is worth ~35 ms on the whole-image forward (the
    standalone s2d of c1 forces a pathological layout assignment).
    ``pooled`` (B, H/4, W/4, 64) skips the maxpool entirely — the fused
    v2 stem (ops/pallas_stem.stem_pool_conv) computes it in-kernel."""
    if pooled is not None:
        xx = pooled.astype(dtype)
    elif c1.shape[1] % 2 == 0 and c1.shape[2] % 2 == 0:
        xx = maxpool_s2d(c1)
    else:
        xx = nn.max_pool(c1, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    feats = []
    for i, n_blocks in enumerate(stages):
        for j in range(n_blocks):
            stride = 2 if (i > 0 and j == 0) else 1
            if bottleneck:
                xx = _bottleneck_block(ep, eb, xx, i, j, stride, dtype)
            elif i == 0:
                # layer1 residual blocks with the add folded into the
                # convs — measured v5e 63.7 → 56.8 ms on the whole-image
                # forward (scripts/exp_r3f.py); exact (inputs ≥ 0)
                xx = _basic_block_resfold(ep, eb, xx, i, j, dtype)
            else:
                xx = _basic_block(ep, eb, xx, i, j, stride, dtype)
        feats.append(xx)

    c2, c3, c4, c5 = feats
    return [c5, c4, c3, c2, c1]


def encode_stages_fold(ep, eb, c1, stages, dtype, *, br: int = 8,
                       wc: int = 512, interpret: bool = False):
    """:func:`encode_stages` with layer 1's residual blocks computed as
    fused Pallas conv-chains (:func:`wsiseg_tpu.ops.conv9.conv_chain`).

    Layer 1 dominates encoder time at slide scale (64→64 convs at H/4:
    XLA runs them at ~9 TFLOP/s); each block becomes ONE kernel for its
    two convs (bn1+relu and bn2 fused, residual add + final relu in XLA
    — elementwise, fuses into the next kernel's pad). Batch-1 only.
    Deeper stages (channels ≥ 128 at small dims) stay on XLA.
    """
    from wsiseg_tpu.models.fast_decoder import _bn_affine
    from wsiseg_tpu.ops.conv9 import conv_chain

    assert c1.shape[0] == 1, "encode_stages_fold is batch-1 (FCN) only"
    xx = maxpool_s2d(c1) if c1.shape[1] % 2 == 0 and c1.shape[2] % 2 == 0 \
        else nn.max_pool(c1, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    x = xx[0]
    # lane-pad ONCE; the chains consume and emit 128-padded activations
    # (pad_out + kernel input zero-extension), so no per-chain pad
    # materialization; deeper layers' first convs zero-extend instead
    x = jnp.pad(x, ((0, 0), (0, 0), (0, -x.shape[-1] % 128)))
    for j in range(stages[0]):
        p, b = ep[f"layer1_{j}"], eb[f"layer1_{j}"]
        s1, t1 = _bn_affine(p["bn1"], b["bn1"])
        s2, t2 = _bn_affine(p["bn2"], b["bn2"])
        y = conv_chain(x, [(p["conv1"]["kernel"], s1, t1, True),
                           (p["conv2"]["kernel"], s2, t2, False)],
                       br=br, wc=wc, out_dtype=jnp.float32,
                       pad_out=True, interpret=interpret)
        x = jax.nn.relu(y + x.astype(jnp.float32)).astype(dtype)
    xx = x[None]

    # the c2 skip must carry the true channel count; layer 2 consumes the
    # padded activation directly (its first convs zero-extend via _in_pad)
    c_true = ep["layer1_0"]["conv2"]["kernel"].shape[3]
    feats = [xx[..., :c_true]]
    for i, n_blocks in enumerate(stages):
        if i == 0:
            continue
        for j in range(n_blocks):
            stride = 2 if j == 0 else 1
            xx = _basic_block(ep, eb, xx, i, j, stride, dtype)
        feats.append(xx)

    c2, c3, c4, c5 = feats
    return [c5, c4, c3, c2, c1]


def resnet_encode_fast(model, variables, x, dtype=None):
    """Functional inference forward of the ResNet encoder with the s2d
    stem. Returns the deepest-first pyramid [c5, c4, c3, c2, c1] like
    ``YNet.encode``. Any ENCODER_SPECS arch; even input dims required."""
    dtype = dtype or model.dtype
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    block_cls, stages = ENCODER_SPECS[model.arch]

    # stem: s2d(2) + 4x4 stride-1 conv at half resolution
    xs = space_to_depth(x.astype(dtype))
    k = s2d_stem_kernel(ep["stem_conv"]["kernel"]).astype(dtype)
    y = _conv(xs, k, padding=((2, 1), (2, 1)))
    c1 = _bn_relu(y, ep["stem_bn"], eb["stem_bn"]).astype(dtype)

    return encode_stages(ep, eb, c1, stages, dtype,
                         bottleneck=block_cls is not BasicBlock)
