"""Round-3 composite timings: the NEW s2d decoder tail in-graph.

Measures the full whole-image forward (Pallas stem + functional net +
planar postprocess) at bench geometry (3072x4096) with variants:
  1. wired path (decode_fast v2: B2/B3 cell-domain, B4+head s2d(4))
  2. + maxpool_s2d (shares s2d(c1) with the B3 skip via CSE)
  3. + bf16 head output
  4. stage shares: stem / maxpool / L1 / L2-4 / decoder / post

Usage: nohup python scripts/exp_r3b.py > /tmp/exp_r3b.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import flax.linen as nn
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
    from wsiseg_tpu.models.fast_encoder import encode_stages, maxpool_s2d
    from wsiseg_tpu.models.infer_fast import pack_for_stem
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.ops.pallas_stem import fold_stem_weights, stem_conv

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    H, W = 3072, 4096
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = jnp.asarray(np.pad(pack_for_stem(img_u8, cfg.dataset_mean),
                                ((0, 0), (0, 2), (0, 0))))
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

    # ---- full composite variants (stem -> encoder -> decoder, planar) ----
    @jax.jit
    def full_v2(p):
        c1 = stem(p)
        feats = encode_stages(ep, eb, c1, stages, bf)
        return fd.decode_fast(variables, feats, bf, s2d_head=True)[0]

    t_full = bench("FULL v2 (nn.max_pool, f32 s2d4 head)", full_v2, packed)

    def encode_stages_mp(c1):
        """encode_stages with maxpool_s2d instead of reduce_window."""
        xx = maxpool_s2d(c1)
        feats = []
        from wsiseg_tpu.models.fast_encoder import _basic_block
        for i, n_blocks in enumerate(stages):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                xx = _basic_block(ep, eb, xx, i, j, stride, bf)
            feats.append(xx)
        c2, c3, c4, c5 = feats
        return [c5, c4, c3, c2, c1]

    @jax.jit
    def full_v2_mp(p):
        c1 = stem(p)
        feats = encode_stages_mp(c1)
        return fd.decode_fast(variables, feats, bf, s2d_head=True)[0]

    bench("FULL v2 + maxpool_s2d", full_v2_mp, packed)

    # bf16 head: cast the head conv output
    def decode_bf16_head(feats):
        y = fd.decode_fast(variables, feats, bf, s2d_head=True)
        return y.astype(bf)        # proxy: f32->bf16 cast cost only

    # real bf16 head: patch via dtype of final conv — approximate by
    # casting; the conv itself already accumulates f32. Measure the cast:
    @jax.jit
    def full_v2_bfcast(p):
        c1 = stem(p)
        feats = encode_stages_mp(c1)
        return decode_bf16_head(feats)[0]

    bench("FULL v2 + maxpool_s2d + bf16-cast head", full_v2_bfcast, packed)

    # ---- stage shares ----
    stem_j = jax.jit(stem)
    c1 = stem_j(packed)
    sync(c1)
    bench("  stem", stem_j, packed)

    mp1 = jax.jit(lambda c: nn.max_pool(c, (3, 3), (2, 2),
                                        padding=[(1, 1), (1, 1)]))
    mp2 = jax.jit(maxpool_s2d)
    x0 = mp1(c1)
    sync(x0)
    bench("  maxpool reduce_window", mp1, c1)
    x0b = mp2(c1)
    sync(x0b)
    bench("  maxpool_s2d", mp2, c1)

    from wsiseg_tpu.models.fast_encoder import _basic_block

    @jax.jit
    def l1(x):
        for j in range(stages[0]):
            x = _basic_block(ep, eb, x, 0, j, 1, bf)
        return x

    c2 = l1(x0)
    sync(c2)
    bench("  layer1", l1, x0)

    @jax.jit
    def l234(x):
        feats = []
        for i in (1, 2, 3):
            for j in range(stages[i]):
                x = _basic_block(ep, eb, x, i, j, 2 if j == 0 else 1, bf)
            feats.append(x)
        return feats

    f234 = l234(c2)
    sync(f234)
    bench("  layers2-4", l234, c2)

    c3, c4, c5 = f234
    feats = [c5, c4, c3, c2, c1]

    dec = jax.jit(lambda fs: fd.decode_fast(variables, fs, bf,
                                            s2d_head=True))
    o = dec(feats)
    sync(o)
    bench("  decode_fast v2 (planar)", dec, feats)

    # postprocess at s2d(4) dims
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    engine = DenseInferenceEngine(model, variables, cfg)
    mask2 = jnp.ones((H // 4, W // 4), jnp.uint8)
    post = jax.jit(lambda y, m: engine._postprocess_s2d(y, m)[:2])
    y_s = o[0] if o.ndim == 4 else o
    po = post(y_s, mask2)
    sync(po)
    bench("  post_s2d (16 planes)", post, y_s, mask2)

    # host interleave share
    lp, hp_ = jax.block_until_ready(po)
    lp = np.asarray(lp)
    t0 = time.time()
    for _ in range(5):
        engine._interleave4(lp, H, W)
    print(f"{'  host interleave16 (1 of 2 artifacts)':52s} "
          f"{(time.time() - t0) / 5 * 1e3:9.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
