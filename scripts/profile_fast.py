"""Stage-level timing of the CURRENT whole-image FCN fast path.

Decomposes models/infer_fast._segment_packed at the bench geometry
(3072x4096): Pallas stem, maxpool, each encoder stage, each decoder
block, the s2d tail, and the postprocess jit. One process so remote
compiles are amortized.

Usage: nohup python scripts/profile_fast.py > /tmp/profile_fast.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def bench(name, fn, *args, iters=5, flops=None):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:8.2f} TFLOP/s" if flops else ""
    print(f"{name:44s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.fast_decoder import decode_fast
    from wsiseg_tpu.models.fast_encoder import encode_stages
    from wsiseg_tpu.models.infer_fast import pack_for_stem, _segment_packed
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights, stem_conv)
    from wsiseg_tpu.ops.threshold import threshold_probs

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096            # bench slide stitch dims (already aligned)
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)

    packed_np = pack_for_stem(img_u8, cfg.dataset_mean)
    packed = jnp.asarray(np.pad(packed_np, ((0, 0), (0, 2), (0, 0))))
    sync(packed)

    # ---- full fast path ----
    def full(p):
        return _segment_packed(variables, p, tuple(cfg.dataset_mean),
                               tuple(cfg.dataset_std), arch=model.arch,
                               h=H, w=W)

    total = bench("FULL _segment_packed", full, packed)

    # ---- stem alone ----
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]

    @jax.jit
    def stem(p):
        w147, bias = fold_stem_weights(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)
        return stem_conv(p, w147, bias, H // 2, W // 2)[: H // 2][None]

    stem_flops = (H // 2) * (W // 2) * 147 * 64 * 2
    c1 = stem(packed)
    sync(c1)
    bench("pallas stem (u8->c1)", stem, packed, flops=stem_flops)

    # ---- encoder stages from c1 ----
    import flax.linen as nn

    @jax.jit
    def pool(c1):
        return nn.max_pool(c1, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    x0 = pool(c1)
    sync(x0)
    bench("maxpool 3x3/2", pool, c1)

    @jax.jit
    def enc(c1):
        return encode_stages(ep, eb, c1, stages, jnp.bfloat16)

    feats = enc(c1)
    sync(feats)
    enc_flops = 9.5e9 * (H * W) / 512 ** 2 - stem_flops
    bench("encode_stages (post-stem)", enc, c1, flops=enc_flops)

    # ---- decoder ----
    @jax.jit
    def dec(feats):
        return decode_fast(variables, feats, jnp.bfloat16)

    o = dec(feats)
    sync(o)
    bench("decode_fast (s2d tail)", dec, feats)

    # ---- decoder block by block ----
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]
    from wsiseg_tpu.models.fast_decoder import (_bn_affine, _conv, _tile4,
                                                depth_to_space, s2d_kernel,
                                                upsample2x)

    xx = feats[0].astype(jnp.bfloat16)
    skips = list(feats[1:]) + [None]
    for i in range(4):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]

        def dec_block(xx, skip, blk_p=blk_p, blk_b=blk_b):
            xx = upsample2x(xx)
            if skip is not None:
                xx = jnp.concatenate([xx, skip.astype(jnp.bfloat16)], -1)
            for cj in (1, 2):
                y = _conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(jnp.bfloat16))
                s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(jnp.bfloat16)
            return xx

        fn = jax.jit(dec_block)
        skip = skips[i]
        nxt = fn(xx, skip)
        sync(nxt)
        ci = 2 * xx.shape[-1] if skip is None else \
            xx.shape[-1] + skip.shape[-1]
        co = nxt.shape[-1]
        fl = nxt.shape[1] * nxt.shape[2] * 9 * 2 * (ci * co + co * co)
        bench(f"dec block{i} ({ci}->{co} @{nxt.shape[1]}x{nxt.shape[2]})",
              fn, xx, skip, flops=fl)
        xx = nxt

    blk_p, blk_b = dp["block4"], db["block4"]
    head = dp["seg_head"]

    @jax.jit
    def block4_s2d(xx):
        xs = jnp.tile(xx, (1, 1, 1, 4))
        for cj in (1, 2):
            k = s2d_kernel(blk_p[f"conv{cj}"]["kernel"]).astype(jnp.bfloat16)
            y = _conv(xs, k)
            s, t = _bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
            xs = jax.nn.relu(y * _tile4(s) + _tile4(t)).astype(jnp.bfloat16)
        kh = s2d_kernel(head["kernel"]).astype(jnp.bfloat16)
        y = _conv(xs, kh) + _tile4(head["bias"].astype(jnp.float32))
        return depth_to_space(y).astype(jnp.float32)

    o4 = block4_s2d(xx)
    sync(o4)
    h4, w4 = xx.shape[1], xx.shape[2]
    fl = h4 * w4 * 2 * 9 * (128 * 64 + 64 * 64 + 64 * 16)
    bench(f"block4+head s2d (@{h4}x{w4} cells)", block4_s2d, xx, flops=fl)

    # ---- postprocess ----
    canvas = o[0]
    mask = jnp.ones((H, W), jnp.uint8)

    @jax.jit
    def post(canvas, mask):
        labels, probs = threshold_probs(canvas, cfg.class_probs)
        heat = (probs[..., 2] + probs[..., 3]) * (mask > 0)
        heat_u8 = jnp.clip(jnp.round(heat * 255.0), 0, 255).astype(jnp.uint8)
        return labels, probs, heat_u8

    po = post(canvas, mask)
    sync(po)
    bench("postprocess (threshold+heat)", post, canvas, mask)

    print("done", flush=True)


if __name__ == "__main__":
    main()
