"""End-to-end + per-group profile of the fold FCN path at bench scale
(3072×4096 level-2 image).

Usage: nohup python scripts/profile_fold.py > /tmp/profile_fold.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.fast_decoder import decode_fast, decode_fold
from wsiseg_tpu.models.fast_encoder import encode_stages, encode_stages_fold
from wsiseg_tpu.models.infer_fast import pack_for_stem, _segment_packed
from wsiseg_tpu.models.resnet import ENCODER_SPECS
from wsiseg_tpu.models.ynet import init_ynet


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:8, :8]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    H, W = 3072, 4096
    cfg = default_config(compute_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    packed = jnp.asarray(pack_for_stem(img, cfg.dataset_mean))
    mean, std = tuple(cfg.dataset_mean), tuple(cfg.dataset_std)

    # cheap/known-compile entries first (chain kernels compile slowly
    # through the remote helper — keep partial logs useful)
    bench("FULL _segment_packed fold=False",
          lambda p: _segment_packed(variables, p, mean, std,
                                    arch=model.arch, h=H, w=W,
                                    fold=False), packed)
    c1 = jnp.asarray(rng.randn(1, H // 2, W // 2, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bench("encode_stages (XLA l1)",
          jax.jit(lambda c: encode_stages(ep, eb, c, stages,
                                          jnp.bfloat16)), c1)
    from wsiseg_tpu.models.fast_encoder import maxpool_s2d
    import flax.linen as nn
    bench("maxpool reduce_window",
          jax.jit(lambda c: nn.max_pool(c, (3, 3), (2, 2),
                                        padding=[(1, 1), (1, 1)])), c1)
    bench("maxpool_s2d",
          jax.jit(lambda c: maxpool_s2d(c)), c1)
    feats = jax.jit(lambda c: encode_stages(ep, eb, c, stages,
                                            jnp.bfloat16))(c1)
    bench("decode_fast (s2d tail)",
          jax.jit(lambda f: decode_fast(variables, f, jnp.bfloat16)),
          feats)
    bench("decode_fold singles",
          jax.jit(lambda f: decode_fold(variables, f, jnp.bfloat16,
                                        use_chain=False)), feats)
    bench("decode_fold chain",
          jax.jit(lambda f: decode_fold(variables, f, jnp.bfloat16)),
          feats)
    bench("encode_stages_fold (chain l1)",
          jax.jit(lambda c: encode_stages_fold(ep, eb, c, stages,
                                               jnp.bfloat16)), c1)
    bench("FULL _segment_packed fold=True",
          lambda p: _segment_packed(variables, p, mean, std,
                                    arch=model.arch, h=H, w=W,
                                    fold=True), packed)
    bench("FULL fold=True planar head",
          lambda p: _segment_packed(variables, p, mean, std,
                                    arch=model.arch, h=H, w=W, fold=True,
                                    planar_head=True), packed)
    bench("decode_fold singles planar",
          jax.jit(lambda f: decode_fold(variables, f, jnp.bfloat16,
                                        use_chain=False,
                                        planar_head=True)), feats)
    bench("decode_fold chain planar",
          jax.jit(lambda f: decode_fold(variables, f, jnp.bfloat16,
                                        planar_head=True)), feats)
    print("done", flush=True)


if __name__ == "__main__":
    main()
