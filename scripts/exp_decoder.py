"""TPU experiments: decoder-tail + stem optimization variants at slide scale.

Times, on the real chip, the candidate fixes for the profiled hot spots
(see /tmp/profile_stages.log): pallas stem, broadcast-upsample vs
jax.image.resize, block1 dissection, block3 in s2d(2) domain, d2s relayout.

Run: nohup python scripts/exp_decoder.py > /tmp/exp_decoder.log 2>&1 &
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


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:48s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet
    from wsiseg_tpu.models.fast_decoder import (
        s2d_kernel_f, space_to_depth, depth_to_space, upsample2x,
        unet_segment_fast, _conv, _bn_affine)
    from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights, pack_image,
                                            stem_conv, stem_geometry)

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)
    bf = jnp.bfloat16

    H, W = 3328, 4352
    rng = np.random.RandomState(0)

    # ---------------- pallas stem at full scale ----------------
    p = variables["params"]["encoder"]
    b = variables["batch_stats"]["encoder"]
    Hout, Wout = H // 2, W // 2
    img = rng.randint(0, 255, (H + 6, W + 6, 3), np.uint8)
    img6 = jnp.asarray(pack_image(img, Hout, Wout))
    w147, bias = fold_stem_weights(
        p["stem_conv"]["kernel"], p["stem_bn"]["scale"], p["stem_bn"]["bias"],
        b["stem_bn"]["mean"], b["stem_bn"]["var"],
        cfg.dataset_mean, cfg.dataset_std)
    w147 = jax.device_put(w147)
    bias = jax.device_put(bias)

    def pstem(img6):
        return stem_conv(img6, w147, bias, Hout, Wout)

    o = pstem(img6)
    sync(o)
    bench("pallas stem (norm+conv+bn+relu fused)", pstem, img6)

    # correctness vs XLA stem at full scale
    mean = jnp.asarray(cfg.dataset_mean)
    std = jnp.asarray(cfg.dataset_std)

    @jax.jit
    def xla_stem(u8):
        x = (u8.astype(jnp.float32) / 255.0 - mean) / std
        y = jax.lax.conv_general_dilated(
            x[None].astype(bf), p["stem_conv"]["kernel"].astype(bf),
            (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0]
        s, t = _bn_affine(p["stem_bn"], b["stem_bn"])
        return jax.nn.relu(y * s + t).astype(bf)

    ref = xla_stem(jnp.asarray(img))
    sync(ref)
    bench("XLA stem (norm+conv valid+bn+relu)", xla_stem, jnp.asarray(img))
    err = jnp.max(jnp.abs(o[:Hout].astype(jnp.float32)
                          - ref[:Hout, :Wout].astype(jnp.float32)))
    print(f"stem parity max abs err: {float(err):.4f}", flush=True)

    # ---------------- upsample variants ----------------
    x0 = jnp.asarray(rng.randn(1, 208, 272, 256).astype(np.float32)).astype(bf)
    x3 = jnp.asarray(rng.randn(1, 832, 1088, 64).astype(np.float32)).astype(bf)

    def up_resize(x):
        b_, h_, w_, c_ = x.shape
        return jax.image.resize(x, (b_, 2 * h_, 2 * w_, c_), "nearest")

    f_resize = jax.jit(up_resize)
    f_bcast = jax.jit(upsample2x)
    for nm, xx in (("256ch@208x272", x0), ("64ch@832x1088", x3)):
        sync(f_resize(xx)); bench(f"resize nearest {nm}", f_resize, xx)
        sync(f_bcast(xx)); bench(f"broadcast up2x {nm}", f_bcast, xx)

    # ---------------- block1 dissection ----------------
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]
    c3 = jnp.asarray(rng.randn(1, 416, 544, 128).astype(np.float32)).astype(bf)

    def b1_convs(xcat):
        xx = xcat
        for cj in (1, 2):
            y = _conv(xx, dp["block1"][f"conv{cj}"]["kernel"].astype(bf))
            s, t = _bn_affine(dp["block1"][f"bn{cj}"], db["block1"][f"bn{cj}"])
            xx = jax.nn.relu(y * s + t).astype(bf)
        return xx

    xcat = jnp.concatenate([f_bcast(x0), c3], -1)
    f_b1c = jax.jit(b1_convs)
    sync(f_b1c(xcat))
    bench("block1 convs only (384->128->128 @416x544)", f_b1c, xcat)

    def b1_full_bcast(x0, c3):
        return b1_convs(jnp.concatenate([upsample2x(x0), c3], -1))

    f_b1f = jax.jit(b1_full_bcast)
    sync(f_b1f(x0, c3))
    bench("block1 full (broadcast up)", f_b1f, x0, c3)

    def b1_full_resize(x0, c3):
        return b1_convs(jnp.concatenate([up_resize(x0), c3], -1))

    f_b1r = jax.jit(b1_full_resize)
    sync(f_b1r(x0, c3))
    bench("block1 full (resize up)", f_b1r, x0, c3)

    # block1 in s2d2 domain: 1536 -> 512 -> 512 @208x272
    def b1_s2d(x0, c3):
        xs = jnp.concatenate([jnp.tile(x0, (1, 1, 1, 4)),
                              space_to_depth(c3, 2)], -1)   # (208,272,1536)
        perm = np.empty(1536, np.int32)
        for j in range(1536):
            if j < 1024:
                q, c = j // 256, j % 256
                ci = c
            else:
                q, c = (j - 1024) // 128, (j - 1024) % 128
                ci = 256 + c
            perm[j] = q * 384 + ci
        k1 = s2d_kernel_f(dp["block1"]["conv1"]["kernel"], 2)[:, :, perm, :]
        y = _conv(xs, k1.astype(bf))
        s, t = _bn_affine(dp["block1"]["bn1"], db["block1"]["bn1"])
        xs = jax.nn.relu(y * jnp.tile(s, 4) + jnp.tile(t, 4)).astype(bf)
        k2 = s2d_kernel_f(dp["block1"]["conv2"]["kernel"], 2)
        y = _conv(xs, k2.astype(bf))
        s, t = _bn_affine(dp["block1"]["bn2"], db["block1"]["bn2"])
        return jax.nn.relu(y * jnp.tile(s, 4) + jnp.tile(t, 4)).astype(bf)

    f_b1s = jax.jit(b1_s2d)
    o_s = f_b1s(x0, c3)
    sync(o_s)
    bench("block1 s2d2 (1536->512->512 @208x272)", f_b1s, x0, c3)
    ref1 = f_b1f(x0, c3)
    err = jnp.max(jnp.abs(depth_to_space(o_s, 2).astype(jnp.float32)
                          - ref1.astype(jnp.float32)))
    print(f"block1 s2d parity max abs err: {float(err):.4f}", flush=True)

    # ---------------- block3 std vs s2d2 ----------------
    b2 = x3                                     # 64ch @832x1088
    c1 = jnp.asarray(rng.randn(1, 1664, 2176, 64).astype(np.float32)).astype(bf)

    def b3_std(b2, c1):
        xx = jnp.concatenate([upsample2x(b2), c1], -1)
        for cj in (1, 2):
            y = _conv(xx, dp["block3"][f"conv{cj}"]["kernel"].astype(bf))
            s, t = _bn_affine(dp["block3"][f"bn{cj}"], db["block3"][f"bn{cj}"])
            xx = jax.nn.relu(y * s + t).astype(bf)
        return xx

    f_b3 = jax.jit(b3_std)
    sync(f_b3(b2, c1))
    bench("block3 std (128->32->32 @1664x2176, bcast up)", f_b3, b2, c1)

    def b3_s2d(b2, c1):
        xs = jnp.concatenate([jnp.tile(b2, (1, 1, 1, 4)),
                              space_to_depth(c1, 2)], -1)    # (832,1088,512)
        perm = np.empty(512, np.int32)
        for j in range(512):
            if j < 256:
                q, c = j // 64, j % 64
                ci = c
            else:
                q, c = (j - 256) // 64, (j - 256) % 64
                ci = 64 + c
            perm[j] = q * 128 + ci
        k1 = s2d_kernel_f(dp["block3"]["conv1"]["kernel"], 2)[:, :, perm, :]
        y = _conv(xs, k1.astype(bf))
        s, t = _bn_affine(dp["block3"]["bn1"], db["block3"]["bn1"])
        xs = jax.nn.relu(y * jnp.tile(s, 4) + jnp.tile(t, 4)).astype(bf)
        k2 = s2d_kernel_f(dp["block3"]["conv2"]["kernel"], 2)
        y = _conv(xs, k2.astype(bf))
        s, t = _bn_affine(dp["block3"]["bn2"], db["block3"]["bn2"])
        return jax.nn.relu(y * jnp.tile(s, 4) + jnp.tile(t, 4)).astype(bf)

    f_b3s = jax.jit(b3_s2d)
    o3s = f_b3s(b2, c1)
    sync(o3s)
    bench("block3 s2d2 (512->128->128 @832x1088)", f_b3s, b2, c1)
    err = jnp.max(jnp.abs(depth_to_space(o3s, 2).astype(jnp.float32)
                          - f_b3(b2, c1).astype(jnp.float32)))
    print(f"block3 s2d parity max abs err: {float(err):.4f}", flush=True)

    f_d2s = jax.jit(lambda x: depth_to_space(x, 2))
    sync(f_d2s(o3s))
    bench("d2s relayout 128ch@832x1088 -> 32ch@1664", f_d2s, o3s)

    # ---------------- full fast segment (round-1 baseline) -------------
    img_full = jnp.asarray(rng.randint(0, 255, (1, H, W, 3), np.uint8))

    @jax.jit
    def seg_fast(u8):
        x = (u8.astype(jnp.float32) / 255.0 - mean) / std
        return unet_segment_fast(model, variables, x)

    sync(seg_fast(img_full))
    bench("segment FAST r1 (incl normalize)", seg_fast, img_full)

    print("done", flush=True)


if __name__ == "__main__":
    main()
