"""Round-3e: in-graph A/B after the bf16 planar head.

FULL fused (pack->stem->encoder->decode_cells->post) at 3072x4096:
  A. current (bf16 s2d(4) head)
  B. layer1 as width-packed (k=2) convs — timing probe (shallow halo,
     inexact borders; only a GO/NO-GO for implementing the exact version)
  C. batch-2 slides through one graph (fixed-overhead amortization)

Usage: nohup python scripts/exp_r3e.py > /tmp/exp_r3e.log 2>&1 &
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
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.models import fast_decoder as fd
    from wsiseg_tpu.models import fast_encoder as fe
    from wsiseg_tpu.models.infer_fast import pack_for_stem
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import fold_stem_weights, stem_conv

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = jnp.asarray(np.pad(pack_for_stem(img_u8, cfg.dataset_mean),
                                ((0, 0), (0, 2), (0, 0))))
    mask2 = jnp.ones((H // 4, W // 4), jnp.uint8)
    sync(packed)

    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]
    bf = jnp.bfloat16

    def stem(p):
        w147, bias = fold_stem_weights(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)
        return stem_conv(p, w147, bias, H // 2, W // 2)[: H // 2][None]

    @jax.jit
    def full_a(p):
        c1 = stem(p)
        feats = fe.encode_stages(ep, eb, c1, stages, bf)
        y = fd.decode_cells(variables, feats, bf, s2d_head=True)[0]
        return engine._postprocess_s2d(y, mask2)[:2]

    bench("A: FULL fused (bf16 s2d4 head)", full_a, packed)

    # B: layer1 via width-packed convs (timing probe)
    from wsiseg_tpu.models.fast_decoder import _bn_affine

    def bd(w):
        z = jnp.zeros_like(w)
        return jnp.concatenate([jnp.concatenate([w, z], 3),
                                jnp.concatenate([z, w], 3)], 2)

    def l1_wpack(x):                      # x: (1, H4, W4, 64)
        b, h, w, c = x.shape
        left = jnp.pad(x[:, :, : w // 2 + 4], ((0, 0), (0, 0), (0, 0),
                                               (0, 0)))
        right = x[:, :, w // 2 - 4:]
        xp = jnp.concatenate([left, right], axis=-1)   # (1,h,w/2+4,128)
        for j in range(stages[0]):
            p, bb = ep[f"layer1_{j}"], eb[f"layer1_{j}"]
            idn = xp
            s1, t1 = _bn_affine(p["bn1"], bb["bn1"])
            y = fd._conv(xp, bd(p["conv1"]["kernel"].astype(bf)))
            xp = jax.nn.relu(y * jnp.tile(s1, 2) + jnp.tile(t1, 2)
                             ).astype(bf)
            s2, t2 = _bn_affine(p["bn2"], bb["bn2"])
            y = fd._conv(xp, bd(p["conv2"]["kernel"].astype(bf)))
            y = y * jnp.tile(s2, 2) + jnp.tile(t2, 2)
            xp = jax.nn.relu(y + idn.astype(jnp.float32)).astype(bf)
        return jnp.concatenate([xp[:, :, : w // 2, :c],
                                xp[:, :, 4:, c:]], axis=2)

    @jax.jit
    def full_b(p):
        c1 = stem(p)
        xx = fe.maxpool_s2d(c1)
        c2 = l1_wpack(xx)
        x = c2
        feats = []
        for i in (1, 2, 3):
            for j in range(stages[i]):
                x = fe._basic_block(ep, eb, x, i, j, 2 if j == 0 else 1, bf)
            feats.append(x)
        c3, c4, c5 = feats
        y = fd.decode_cells(variables, [c5, c4, c3, c2, c1], bf,
                            s2d_head=True)[0]
        return engine._postprocess_s2d(y, mask2)[:2]

    bench("B: FULL fused + L1 wpack2 (timing probe)", full_b, packed)

    # C: batch 2
    packed2 = jnp.stack([packed, packed])

    @jax.jit
    def full_c(p2):
        outs = []
        for k in range(2):
            c1 = stem(p2[k])
            feats = fe.encode_stages(ep, eb, c1, stages, bf)
            y = fd.decode_cells(variables, feats, bf, s2d_head=True)[0]
            outs.append(engine._postprocess_s2d(y, mask2)[:2])
        return outs

    d = bench("C: two slides, one dispatch", full_c, packed2)
    print(f"   per-slide: {d * 1e3 / 2:.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
