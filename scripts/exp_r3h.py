"""Round-3h: stage shares of the CURRENT production dispatch.

Truncation ablation of the fused fast path (v2 stem + resfold encoder +
decode_cells + s2d postprocess) at bench geometry (3072x4096), all as
single jitted dispatches consuming a tiny slice (sync pattern of
exp_r3b; standalone stage timings are unreliable here, truncations of
one graph are the working methodology):

  T0 stem v2 only
  T1 + encoder (resfold L1 + L2-4)
  T2 + decoder blocks 0-1 (native)
  T3 + blocks 2-3 (s2d(2) cells)
  T4 + block4/head (s2d(4))          == full forward
  T5 + s2d postprocess (labels/heat) == production dispatch

Usage: nohup python scripts/exp_r3h.py > /tmp/exp_r3h.log 2>&1 &
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
    from wsiseg_tpu.models.fast_encoder import encode_stages
    from wsiseg_tpu.models.infer_fast import pack_for_stem2
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights2,
                                            stem_pool_conv)

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096
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
        c1s2d, pool = stem_pool_conv(p, w336, bias2, H // 2, W // 2)
        half = H // 4
        return c1s2d[:half][None], pool[:half][None]

    def decode_trunc(feats, c1s2d, stop: int):
        """decode_cells truncated after `stop` units (1=blocks01, 2=+b23,
        3=+b4/head). Mirrors fast_decoder.decode_cells exactly."""
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
        if stop == 1:
            return xx
        for i in (2, 3):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            cup = xx.shape[-1]
            w1 = blk_p["conv1"]["kernel"]
            s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
            k2 = fd.s2d_kernel(blk_p["conv2"]["kernel"]).astype(bf)
            s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
            sk = c1s2d.astype(bf) if i == 3 \
                else fd.space_to_depth(skips[i].astype(bf))
            # no-concat conv1 (exp_r6a): two summed convs, mirrors
            # decode_cells post round-4
            y = fd._conv(xx, fd.upfold_kernel(w1[:, :, :cup]).astype(bf)) \
                + fd._conv(sk, fd.s2d_kernel(w1[:, :, cup:]).astype(bf))
            xs = jax.nn.relu(y * fd._tile4(s1) + fd._tile4(t1)).astype(bf)
            y = fd._conv(xs, k2)
            xs = jax.nn.relu(y * fd._tile4(s2) + fd._tile4(t2)).astype(bf)
            xx = fd.depth_to_space(xs) if i == 2 else xs
        if stop == 2:
            return xx
        blk_p, blk_b = dp["block4"], db["block4"]
        k1 = fd.upfold2_kernel(blk_p["conv1"]["kernel"]).astype(bf)
        y = fd._conv(xx, k1)
        s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
        xs = jax.nn.relu(y * jnp.tile(s1, 16) + jnp.tile(t1, 16)).astype(bf)
        k2 = fd.s2d_kernel_f(blk_p["conv2"]["kernel"], 4).astype(bf)
        y = fd._conv(xs, k2)
        s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
        xs = jax.nn.relu(y * jnp.tile(s2, 16) + jnp.tile(t2, 16)).astype(bf)
        head = dp["seg_head"]
        kh = fd.s2d_kernel_f(head["kernel"], 4).astype(bf)
        y = fd._conv(xs, kh) + jnp.tile(head["bias"].astype(jnp.float32), 16)
        return y.astype(bf)

    @jax.jit
    def t0(p):
        c1s2d, pool = stem(p)
        return c1s2d, pool

    @jax.jit
    def t1(p):
        c1s2d, pool = stem(p)
        feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
        return feats[0], feats[1], feats[2], feats[3]

    def make_trunc(stop):
        @jax.jit
        def t(p):
            c1s2d, pool = stem(p)
            feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
            return decode_trunc(feats, c1s2d, stop)
        return t

    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    engine = DenseInferenceEngine(model, variables, cfg)
    mask2 = jnp.ones((H // 4, W // 4), jnp.uint8)

    @jax.jit
    def t5(p):
        c1s2d, pool = stem(p)
        feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
        y = decode_trunc(feats, c1s2d, 3)[0]
        labels_p, heat_p = engine._postprocess_s2d(y, mask2)[:2]
        g = labels_p.shape[0] // 4
        labels_p = (labels_p[:g] | (labels_p[g:2 * g] << 2)
                    | (labels_p[2 * g:3 * g] << 4) | (labels_p[3 * g:] << 6))
        return labels_p, heat_p

    if os.environ.get("R3H_TRUNC", "1") == "1":
        d0 = bench("T0 stem v2", t0, packed)
        d1 = bench("T1 + encoder", t1, packed)
        d2 = bench("T2 + dec blocks 0-1", make_trunc(1), packed)
        d3 = bench("T3 + blocks 2-3", make_trunc(2), packed)
        d4 = bench("T4 + block4/head (full fwd)", make_trunc(3), packed)
        d5 = bench("T5 + postprocess (production)", t5, packed)
        print(f"\nshares: stem {d0*1e3:.1f} | enc {(d1-d0)*1e3:.1f} | "
              f"b01 {(d2-d1)*1e3:.1f} | b23 {(d3-d2)*1e3:.1f} | "
              f"b4+head {(d4-d3)*1e3:.1f} | post {(d5-d4)*1e3:.1f}",
              flush=True)
    else:
        bench("T5 + postprocess (production)", t5, packed)

    # slides-in-flight sweep on the production path (bench runs 4; the
    # x2 exp_r3f number was better per-slide — re-measure head-to-head)
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide
    from bench import _synthetic_level2
    img = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: img}, num_levels=3)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
    for nsf in (1, 2, 3, 4, 6):
        r = engine.device_throughput(plan, mode="fcn", iters=5,
                                     slides_in_flight=nsf)
        print(f"slides_in_flight={nsf}: {r['patches_per_sec']:8.1f} p/s  "
              f"{r['sec_per_slide']*1e3:6.1f} ms/slide", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
