"""Round-3l: layer1 (resfold) in the s2d(2) domain — full-graph A/B.

The round-3a layer1-s2d probe broke even, but it predates resfold and the
conv-rate data (exp_r3j: 3x3 conv at 256 lanes runs ~2.4x the rate of 128
lanes on this chip). With resfold the s2d(2) layer1 convs are 256->512 and
512->256 — prime MXU shapes. s2d tap redundancy for 3x3 stride-1 is
16/9 = 1.78x FLOPs; if the wide convs deliver >1.78x the rate, this wins.

  A: current full forward (native resfold layer1)     [exp_r3h T4]
  B: layer1 s2d(2): s2d(pool) -> 2 resfold-s2d blocks -> layer2 conv1 via
     s2d_stride2_kernel + downsample as sub-position-0 1x1; the decoder
     block2 skip consumes the s2d c2 directly (no s2d(c2) relayout).
     The s2d(pool) relayout cost is INCLUDED (a production version would
     emit pool in s2d layout from the stem kernel for free).

Also checks A == B numerically on a logits slice.

Usage: nohup python scripts/exp_r3l.py > /tmp/exp_r3l.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models import fast_decoder as fd
    from wsiseg_tpu.models.fast_encoder import (_basic_block, _bn_relu,
                                                encode_stages)
    from wsiseg_tpu.models.infer_fast import pack_for_stem2
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights2,
                                            stem_pool_conv)

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H = int(os.environ.get("R3L_H", "3072"))
    W = int(os.environ.get("R3L_W", "4096"))
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = np.asarray(pack_for_stem2(img_u8, cfg.dataset_mean))
    if packed.shape[1] == 12:
        packed = np.pad(packed, ((0, 0), (0, 4), (0, 0)))
    packed = jnp.asarray(packed)
    sync(packed)

    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    dp = variables["params"]["decoder"]
    db = variables["batch_stats"]["decoder"]
    _, stages = ENCODER_SPECS[model.arch]
    bf = jnp.bfloat16

    def stem(p):
        w336, bias2 = fold_stem_weights2(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)
        interp = jax.devices()[0].platform == "cpu"
        c1s2d, pool = stem_pool_conv(p, w336, bias2, H // 2, W // 2,
                                     interpret=interp)
        half = H // 4
        return c1s2d[:half][None], pool[:half][None]

    # ---- B pieces -------------------------------------------------------
    def resfold_kernels(j):
        p = ep[f"layer1_{j}"]
        b = eb[f"layer1_{j}"]
        c = 64
        eye = jnp.zeros((3, 3, c, c), jnp.float32).at[1, 1].set(jnp.eye(c))
        s1, t1 = fd._bn_affine(p["bn1"], b["bn1"])
        k1 = jnp.concatenate([p["conv1"]["kernel"] * s1, eye], axis=3)
        bias1 = jnp.concatenate([t1, jnp.zeros((c,), t1.dtype)])
        s2, t2 = fd._bn_affine(p["bn2"], b["bn2"])
        k2 = jnp.concatenate([p["conv2"]["kernel"] * s2, eye], axis=2)
        return k1, bias1, k2, t2

    def layer1_s2d(xs):
        """xs: (1, H/8, W/8, 256) s2d(2) of pool. Returns same layout."""
        for j in range(stages[0]):
            k1, bias1, k2, t2 = resfold_kernels(j)
            k1s = fd.s2d_kernel(k1).astype(bf)
            k2s = fd.s2d_kernel(k2).astype(bf)
            xs = jax.nn.relu(fd._conv(xs, k1s)
                             + jnp.tile(bias1, 4)).astype(bf)
            xs = jax.nn.relu(fd._conv(xs, k2s) + jnp.tile(t2, 4)).astype(bf)
        return xs

    def layer2_from_s2d(xs):
        """layer2 block0 consuming s2d(2) input directly."""
        p = ep["layer2_0"]
        b = eb["layer2_0"]
        k1 = fd.s2d_stride2_kernel(p["conv1"]["kernel"]).astype(bf)
        y = jax.lax.conv_general_dilated(
            xs, k1, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = _bn_relu(y, p["bn1"], b["bn1"]).astype(bf)
        y = fd._conv(y, p["conv2"]["kernel"].astype(bf))
        y = _bn_relu(y, p["bn2"], b["bn2"], relu=False)
        # 1x1/2 downsample = 1x1 conv on the s2d sub-position-(0,0) block
        wds = p["down_conv"]["kernel"]                    # (1, 1, 64, 128)
        wds_s = jnp.pad(wds, ((0, 0), (0, 0), (0, 192), (0, 0)))
        ident = jax.lax.conv_general_dilated(
            xs, wds_s.astype(bf), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ident = _bn_relu(ident, p["down_bn"], b["down_bn"], relu=False)
        return jax.nn.relu(y + ident).astype(bf)

    def decode_cells_skips2d(feats, c1s2d, c2s2d):
        """decode_cells with BOTH deep skips pre-s2d (c2 from layer1-s2d,
        c1 from the stem kernel)."""
        xx = feats[0].astype(bf)
        skips = list(feats[1:]) + [None]
        for i in (0, 1):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            xx = fd.upsample2x(xx)
            xx = jnp.concatenate([xx, skips[i].astype(bf)], axis=-1)
            for cj in (1, 2):
                y = fd._conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(bf))
                s, t = fd._bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(bf)
        for i in (2, 3):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            cup = xx.shape[-1]
            w1 = blk_p["conv1"]["kernel"]
            k1 = jnp.concatenate([fd.upfold_kernel(w1[:, :, :cup]),
                                  fd.s2d_kernel(w1[:, :, cup:])],
                                 axis=2).astype(bf)
            s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
            k2 = fd.s2d_kernel(blk_p["conv2"]["kernel"]).astype(bf)
            s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
            sk = (c2s2d if i == 2 else c1s2d).astype(bf)
            xin = jnp.concatenate([xx, sk], axis=-1)
            y = fd._conv(xin, k1)
            xs = jax.nn.relu(y * fd._tile4(s1) + fd._tile4(t1)).astype(bf)
            y = fd._conv(xs, k2)
            xs = jax.nn.relu(y * fd._tile4(s2) + fd._tile4(t2)).astype(bf)
            xx = fd.depth_to_space(xs) if i == 2 else xs
        blk_p, blk_b = dp["block4"], db["block4"]
        k1 = fd.upfold2_kernel(blk_p["conv1"]["kernel"]).astype(bf)
        y = fd._conv(xx, k1)
        s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
        xs = jax.nn.relu(y * jnp.tile(s1, 16)
                         + jnp.tile(t1, 16)).astype(bf)
        k2 = fd.s2d_kernel_f(blk_p["conv2"]["kernel"], 4).astype(bf)
        y = fd._conv(xs, k2)
        s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
        xs = jax.nn.relu(y * jnp.tile(s2, 16)
                         + jnp.tile(t2, 16)).astype(bf)
        head = dp["seg_head"]
        kh = fd.s2d_kernel_f(head["kernel"], 4).astype(bf)
        y = fd._conv(xs, kh) + jnp.tile(head["bias"].astype(jnp.float32),
                                        16)
        return y.astype(bf)

    @jax.jit
    def full_a(p):
        c1s2d, pool = stem(p)
        feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
        return fd.decode_cells(variables, feats, bf, s2d_head=True,
                               skip3_s2d=c1s2d)[0]

    @jax.jit
    def full_b(p):
        c1s2d, pool = stem(p)
        xs = fd.space_to_depth(pool.astype(bf))      # (1, H/8, W/8, 256)
        c2s2d = layer1_s2d(xs)
        xx = layer2_from_s2d(c2s2d)
        for j in range(1, stages[1]):
            xx = _basic_block(ep, eb, xx, 1, j, 1, bf)
        c3 = xx
        for j in range(stages[2]):
            xx = _basic_block(ep, eb, xx, 2, j, 2 if j == 0 else 1, bf)
        c4 = xx
        for j in range(stages[3]):
            xx = _basic_block(ep, eb, xx, 3, j, 2 if j == 0 else 1, bf)
        dec_feats = [xx, c4, c3, None, None]
        return decode_cells_skips2d(dec_feats, c1s2d, c2s2d)[0]

    da = bench("A full fwd (native layer1)", full_a, packed)
    dbt = bench("B full fwd (layer1 s2d(2))", full_b, packed)

    ya = full_a(packed)
    yb = full_b(packed)
    sl_a = np.asarray(ya[:64, :64]).astype(np.float32)
    sl_b = np.asarray(yb[:64, :64]).astype(np.float32)
    err = np.max(np.abs(sl_a - sl_b))
    print(f"max|A-B| on 64x64 logit slice: {err:.4f}", flush=True)
    print(f"delta: {(da - dbt) * 1e3:+.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
