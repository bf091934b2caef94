"""Stage-level profile of the grid-mode batched tile forward
(batch=infer_batch_size 512² tiles): where do the ~123 ms/batch go?

Usage: nohup python scripts/profile_grid.py > /tmp/profile_grid.log 2>&1 &
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
from wsiseg_tpu.models.fast_decoder import decode_fast
from wsiseg_tpu.models.fast_encoder import encode_stages
from wsiseg_tpu.models.resnet import ENCODER_SPECS
from wsiseg_tpu.models.ynet import YNet, init_ynet


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :2, :]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5, flops=None):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    B, T = 128, 512
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         infer_batch_size=B)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, T, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # full forward (what _segment runs today)
    from wsiseg_tpu.models.fast_decoder import unet_segment_fast
    bench("unet_segment_fast full fwd (B=128)",
          jax.jit(lambda v, a: unet_segment_fast(model, v, a)),
          variables, x, flops=B * 18.6e9)

    # stem alone
    import flax.linen as nn

    def stem(v, a):
        y = jax.lax.conv_general_dilated(
            a, v["params"]["encoder"]["stem_conv"]["kernel"].astype(a.dtype),
            (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)
    fl_stem = B * T * T // 4 * 49 * 3 * 64 * 2
    bench("stem 7x7/2 XLA (B=128)", jax.jit(stem), variables, x,
          flops=fl_stem)

    # encoder stages from c1
    c1 = jnp.asarray(rng.randn(B, T // 2, T // 2, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bench("encode_stages (B=128)",
          jax.jit(lambda e, b, c: encode_stages(e, b, c, stages,
                                                jnp.bfloat16)),
          ep, eb, c1)

    def enc_feats(c):
        return encode_stages(ep, eb, c, stages, jnp.bfloat16)
    feats = jax.jit(enc_feats)(c1)
    feats = jax.tree_util.tree_map(lambda a: a, feats)

    bench("decode_fast s2d tail (B=128)",
          jax.jit(lambda v, f: decode_fast(v, f, jnp.bfloat16)),
          variables, feats)

    print("done", flush=True)


if __name__ == "__main__":
    main()
