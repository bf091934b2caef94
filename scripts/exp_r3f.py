"""Round-3f: resfold layer1 + two-slide dispatch, in-graph (v2 stem).

  A. FULL fused current (v2 stem + L1 residual blocks + decode_cells + post)
  B. A with layer1 as resfold blocks (residual folded into the convs)
  C. best-of x2 slides in one dispatch (per-slide time)

Usage: nohup python scripts/exp_r3f.py > /tmp/exp_r3f.log 2>&1 &
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
    from wsiseg_tpu.models.infer_fast import pack_for_stem2
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import (fold_stem_weights2,
                                            stem_pool_conv)

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = jnp.asarray(pack_for_stem2(img_u8, cfg.dataset_mean))
    packed = jnp.pad(packed, ((0, 0), (0, 4), (0, 0)))
    mask2 = jnp.ones((H // 4, W // 4), jnp.uint8)
    sync(packed)

    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]
    bf = jnp.bfloat16

    def body(p, resfold):
        w336, b2 = fold_stem_weights2(
            ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
            ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
            eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)
        c1e, c1o, pool = stem_pool_conv(p, w336, b2, H // 2, W // 2)
        c1s2d = jnp.concatenate([c1e, c1o], -1)[None]
        x = pool[None].astype(bf)
        for j in range(stages[0]):
            if resfold:
                x = fe._basic_block_resfold(ep, eb, x, 0, j, bf)
            else:
                x = fe._basic_block(ep, eb, x, 0, j, 1, bf)
        c2 = x
        feats = []
        for i in (1, 2, 3):
            for j in range(stages[i]):
                x = fe._basic_block(ep, eb, x, i, j, 2 if j == 0 else 1, bf)
            feats.append(x)
        c3, c4, c5 = feats
        y = fd.decode_cells(variables, [c5, c4, c3, c2, None], bf,
                            s2d_head=True, skip3_s2d=c1s2d)[0]
        return engine._postprocess_s2d(y, mask2)[:2]

    full_a = jax.jit(lambda p: body(p, False))
    bench("A: FULL v2-stem (current)", full_a, packed)

    full_b = jax.jit(lambda p: body(p, True))
    bench("B: FULL v2-stem + resfold L1", full_b, packed)

    packed2 = jnp.stack([packed, packed])

    def body2(p2, resfold):
        return [body(p2[k], resfold) for k in range(2)]

    full_c = jax.jit(lambda p2: body2(p2, True))
    d = bench("C: x2 slides + resfold", full_c, packed2)
    print(f"   per-slide: {d * 1e3 / 2:.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
