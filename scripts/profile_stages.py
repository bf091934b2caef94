"""Stage-level timing of the dense-inference FCN pass on the real chip.

Times each stage of the Y-Net forward at whole-slide scale (3328x4352 padded,
the bench geometry) in ONE process so remote compiles are amortized. Timing
uses the scalar-fetch sync (block_until_ready is unreliable over the relay,
CLAUDE.md). Prints one line per stage.

Usage: nohup python scripts/profile_stages.py > /tmp/profile_stages.log 2>&1 &
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
    sync(out)                        # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:8.2f} TFLOP/s"
    print(f"{name:40s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet
    from wsiseg_tpu.models.fast_decoder import (unet_segment_fast, s2d_kernel,
                                                _conv, _bn_affine, _tile4,
                                                depth_to_space)

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3328, 4352          # padded bench slide (halo 128 each side)
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (1, H, W, 3), np.uint8)
    x_dev = jnp.asarray(img_u8)

    mean = jnp.asarray(cfg.dataset_mean)
    std = jnp.asarray(cfg.dataset_std)

    @jax.jit
    def normalize(u8):
        return (u8.astype(jnp.float32) / 255.0 - mean) / std

    xn = normalize(x_dev)
    sync(xn)
    bench("normalize (f32 out)", normalize, x_dev)

    # ---- stem alone ----
    p = variables["params"]["encoder"]
    b = variables["batch_stats"]["encoder"]

    @jax.jit
    def stem(x):
        k = p["stem_conv"]["kernel"].astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        s, t = _bn_affine(p["stem_bn"], b["stem_bn"])
        return jax.nn.relu(y * s + t).astype(jnp.bfloat16)

    stem_flops = (H // 2) * (W // 2) * 49 * 3 * 64 * 2
    c1 = stem(xn)
    sync(c1)
    bench("stem 7x7/2 (conv+bn+relu)", stem, xn, flops=stem_flops)

    # ---- encoder ----
    @jax.jit
    def encode(x):
        return model.apply(variables, x, method=YNet.encode)

    feats = encode(xn)
    sync(feats)
    # resnet18 ~= 9.5 GFLOP per 512^2 -> scale by pixels
    enc_flops = 9.5e9 * (H * W) / 512 ** 2
    bench("encoder full", encode, xn, flops=enc_flops)

    # ---- encoder stage by stage (functional, from c1) ----
    def maxpool(c1):
        return jax.nn.max_pool if False else jax.lax.reduce_window(
            c1, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    @jax.jit
    def pool_fn(c1):
        return maxpool(c1)

    x0 = pool_fn(c1)
    sync(x0)
    bench("maxpool 3x3/2", pool_fn, c1)

    def basic_block(xx, bp, bb, strides=1):
        idn = xx
        y = jax.lax.conv_general_dilated(
            xx, bp["conv1"]["kernel"].astype(jnp.bfloat16),
            (strides, strides), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        s, t = _bn_affine(bp["bn1"], bb["bn1"])
        y = jax.nn.relu(y * s + t).astype(jnp.bfloat16)
        y2 = jax.lax.conv_general_dilated(
            y, bp["conv2"]["kernel"].astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        s2, t2 = _bn_affine(bp["bn2"], bb["bn2"])
        y2 = y2 * s2 + t2
        if "down_conv" in bp:
            idn = jax.lax.conv_general_dilated(
                xx, bp["down_conv"]["kernel"].astype(jnp.bfloat16),
                (strides, strides), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            si, ti = _bn_affine(bp["down_bn"], bb["down_bn"])
            idn = idn * si + ti
        return jax.nn.relu(y2 + idn.astype(jnp.float32)).astype(jnp.bfloat16)

    def stage(xx, i, strides):
        xx = basic_block(xx, p[f"layer{i}_0"], b[f"layer{i}_0"], strides)
        return basic_block(xx, p[f"layer{i}_1"], b[f"layer{i}_1"], 1)

    cur = x0
    for i, strides in ((1, 1), (2, 2), (3, 2), (4, 2)):
        fn = jax.jit(lambda xx, i=i, s=strides: stage(xx, i, s))
        nxt = fn(cur)
        sync(nxt)
        h_, w_, c_ = cur.shape[1:]
        ho, co = nxt.shape[1], nxt.shape[3]
        fl = (2 * nxt.shape[1] * nxt.shape[2] * 9 * co * c_ * 2 // (strides ** 0)
              )  # rough: 2 blocks x 2 convs
        fl = 4 * nxt.shape[1] * nxt.shape[2] * 9 * co * max(c_, co) * 2
        bench(f"enc layer{i} ({c_}->{co} @{nxt.shape[1]}x{nxt.shape[2]})",
              fn, cur, flops=fl)
        cur = nxt

    # ---- decoder: std vs fast ----
    @jax.jit
    def seg_std(x):
        return model.apply(variables, x, method=YNet.segment)

    @jax.jit
    def seg_fast(x):
        return unet_segment_fast(model, variables, x)

    o = seg_fast(xn)
    sync(o)
    bench("segment FAST (s2d tail)", seg_fast, xn)
    try:
        o = seg_std(xn)
        sync(o)
        bench("segment STD", seg_std, xn)
    except Exception as e:
        print("segment STD failed:", repr(e), flush=True)

    # ---- decoder blocks individually (fast path shapes) ----
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]

    skips = list(feats[1:]) + [None]
    xx = feats[0].astype(jnp.bfloat16)
    for i in range(4):
        blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]

        def dec_block(xx, skip, blk_p=blk_p, blk_b=blk_b):
            b_, h_, w_, c_ = xx.shape
            xx = jax.image.resize(xx, (b_, 2 * h_, 2 * w_, c_), "nearest")
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
        ci = xx.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        co = nxt.shape[-1]
        fl = (nxt.shape[1] * nxt.shape[2] * 9 * 2 * (ci * co + co * co))
        bench(f"dec block{i} ({ci}->{co} @{nxt.shape[1]}x{nxt.shape[2]})",
              fn, xx, skip, flops=fl)
        xx = nxt

    # block4 s2d + head
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
    fl = h4 * w4 * 9 * 2 * (4 * 32 * 4 * 16 + 4 * 16 * 4 * 16 + 4 * 16 * 4 * 4)
    bench(f"dec block4+head s2d (@{h4}x{w4} cells)", block4_s2d, xx, flops=fl)

    print("done", flush=True)


if __name__ == "__main__":
    main()
