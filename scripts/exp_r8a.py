"""Round-8a: INFERENCE ROOFLINE MEMO data (round-4 VERDICT next #1).

Stage-by-stage {ms, executed FLOPs, HBM bytes, roofline-%} accounting of
the production FCN dispatch at bench geometry (3072x4096, bf16), the
exp_r7a-d treatment applied to inference. Methodology:

* Truncation ablation (exp_r3h's working method — standalone stage
  timings are unreliable in-graph): T0 stem .. T5 +postprocess, each a
  single jitted dispatch; stage cost = delta.
* FLOPs + bytes per truncation from XLA's own ``compiled.cost_analysis()``
  (the compiler's static count of executed flops / bytes accessed —
  includes structural zeros of the s2d transforms and all layout glue).
* Roofline floor per stage = max(flops / MEAS_TFLOPS, bytes / MEAS_HBM)
  with the chip-through-relay ceilings measured in exp_r3d
  (87 TFLOP/s bf16 matmul, 140 GB/s HBM).
* Serving-glue split: fused x1 vs x12 dispatch per-slide time (the
  ~17% single-vs-x12 gap), postprocess, host interleave.

Usage: nohup python scripts/exp_r8a.py > /tmp/exp_r8a.log 2>&1 &
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

MEAS_TFLOPS = 87e12     # measured bf16 matmul ceiling (scripts/exp_r3d.py)
MEAS_HBM = 140e9        # measured HBM rate through the relay (exp_r3d)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def bench_compiled(name, fn, *args, iters=8):
    """Lower+compile explicitly so cost_analysis comes from the SAME
    executable that is timed."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        nbytes = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # cost_analysis may be backend-limited
        print(f"  (cost_analysis unavailable for {name}: {e})")
        flops, nbytes = float("nan"), float("nan")
    out = compiled(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.2f} ms  {flops/1e9:10.1f} GFLOP  "
          f"{nbytes/1e9:8.2f} GB", flush=True)
    return dt, flops, nbytes


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

    def t0(p):
        return stem(p)

    def t1(p):
        c1s2d, pool = stem(p)
        feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
        return feats[0], feats[1], feats[2], feats[3]

    def make_trunc(stop):
        def t(p):
            c1s2d, pool = stem(p)
            feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
            return decode_trunc(feats, c1s2d, stop)
        return t

    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    engine = DenseInferenceEngine(model, variables, cfg)
    mask2 = jnp.ones((H // 4, W // 4), jnp.uint8)

    def t5(p):
        c1s2d, pool = stem(p)
        feats = encode_stages(ep, eb, None, stages, bf, pooled=pool)
        y = decode_trunc(feats, c1s2d, 3)[0]
        labels_p, heat_p = engine._postprocess_s2d(y, mask2)[:2]
        g = labels_p.shape[0] // 4
        labels_p = (labels_p[:g] | (labels_p[g:2 * g] << 2)
                    | (labels_p[2 * g:3 * g] << 4) | (labels_p[3 * g:] << 6))
        return labels_p, heat_p

    rows = []
    names = ["T0 stem v2", "T1 +encoder", "T2 +dec b01", "T3 +b23",
             "T4 +b4/head (full fwd)", "T5 +postprocess (production)"]
    fns = [t0, t1, make_trunc(1), make_trunc(2), make_trunc(3), t5]
    for name, fn in zip(names, fns):
        rows.append(bench_compiled(name, fn, packed))

    stages_n = ["stem", "encoder", "dec b01", "dec b23", "b4+head",
                "postprocess"]
    print("\n=== STAGE ROOFLINE TABLE (deltas) ===")
    print(f"{'stage':12s} {'ms':>7s} {'GFLOP':>9s} {'GB':>7s} "
          f"{'TFLOP/s':>8s} {'GB/s':>7s} {'floor ms':>9s} {'roofl%':>7s} "
          f"{'bound':>6s}")
    prev = (0.0, 0.0, 0.0)
    for name, (dt, fl, by) in zip(stages_n, rows):
        sdt, sfl, sby = dt - prev[0], fl - prev[1], by - prev[2]
        prev = (dt, fl, by)
        t_c = sfl / MEAS_TFLOPS
        t_m = sby / MEAS_HBM
        floor = max(t_c, t_m)
        bound = "MXU" if t_c > t_m else "HBM"
        print(f"{name:12s} {sdt*1e3:7.2f} {sfl/1e9:9.1f} {sby/1e9:7.2f} "
              f"{sfl/sdt/1e12:8.2f} {sby/sdt/1e9:7.1f} {floor*1e3:9.2f} "
              f"{100*floor/sdt:6.1f}% {bound:>6s}")
    dt, fl, by = rows[-1]
    t_c, t_m = fl / MEAS_TFLOPS, by / MEAS_HBM
    print(f"{'TOTAL':12s} {dt*1e3:7.2f} {fl/1e9:9.1f} {by/1e9:7.2f} "
          f"{fl/dt/1e12:8.2f} {by/dt/1e9:7.1f} "
          f"{max(t_c, t_m)*1e3:9.2f} {100*max(t_c, t_m)/dt:6.1f}%")

    # --- serving glue: x1 vs x12 per-slide on the production runner ---
    print("\n=== SERVING DISPATCH OVERHEAD ===", flush=True)
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide
    from bench import _synthetic_level2
    img = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: img}, num_levels=3)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
    for nsf in (1, 12):
        r = engine.device_throughput(plan, mode="fcn", iters=6,
                                     slides_in_flight=nsf)
        print(f"slides_in_flight={nsf:2d}: {r['patches_per_sec']:8.1f} p/s "
              f"{r['sec_per_slide']*1e3:6.1f} ms/slide", flush=True)

    # host interleave cost (the host-side share of the serving path)
    hs, ws = plan.stitch_hw
    planes = np.random.randint(0, 255, (16, hs // 4, ws // 4), np.uint8)
    t0_ = time.time()
    for _ in range(10):
        engine._interleave4(planes, hs, ws)
    print(f"host interleave (16 planes -> {hs}x{ws}): "
          f"{(time.time()-t0_)/10*1e3:.1f} ms/slide")


if __name__ == "__main__":
    main()
