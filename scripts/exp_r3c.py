"""Round-3c: tile-batch (grid-mode) forward A/B.

Grid device regressed 1446 -> 1088 p/s after wiring the new decoder +
functional encoder into unet_segment_fast. Isolate which change hurt at
tile shapes (batch 128 x 512^2): flax vs functional encoder (maxpool_s2d)
x old (round-2 s2d(2) block4 tail) vs new (cell-domain B2-B4) decoder.

Usage: nohup python scripts/exp_r3c.py > /tmp/exp_r3c.log 2>&1 &
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


def bench(name, fn, *args, iters=3):
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
    from wsiseg_tpu.models import fast_encoder as fe
    from wsiseg_tpu.models.resnet import ENCODER_SPECS
    from wsiseg_tpu.models.ynet import YNet, init_ynet

    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    print("platform:", jax.devices()[0].platform, flush=True)

    B, T = 128, 512
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T, T, 3).astype(np.float32))
    sync(x)
    bf = jnp.bfloat16
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]
    _, stages = ENCODER_SPECS[model.arch]

    def flax_encode(a):
        return model.apply(variables, a, method=YNet.encode)

    def func_encode(a):
        y = fe._conv(a.astype(bf), ep["stem_conv"]["kernel"].astype(bf),
                     stride=2, padding=((3, 3), (3, 3)))
        c1 = fe._bn_relu(y, ep["stem_bn"], eb["stem_bn"]).astype(bf)
        return fe.encode_stages(ep, eb, c1, stages, bf)

    def decode_old(feats):
        """Round-2 tail: blocks 0-3 native, block4+head s2d(2)."""
        dp = variables["params"]["decoder"]
        db = variables["batch_stats"]["decoder"]
        xx = feats[0].astype(bf)
        skips = list(feats[1:]) + [None]
        for i in range(4):
            blk_p, blk_b = dp[f"block{i}"], db[f"block{i}"]
            xx = fd.upsample2x(xx)
            if skips[i] is not None:
                xx = jnp.concatenate([xx, skips[i].astype(bf)], axis=-1)
            for cj in (1, 2):
                y = fd._conv(xx, blk_p[f"conv{cj}"]["kernel"].astype(bf))
                s, t = fd._bn_affine(blk_p[f"bn{cj}"], blk_b[f"bn{cj}"])
                xx = jax.nn.relu(y * s + t).astype(bf)
        blk_p, blk_b = dp["block4"], db["block4"]
        k1 = fd.upfold_kernel(blk_p["conv1"]["kernel"]).astype(bf)
        y = fd._conv(xx, k1)
        s1, t1 = fd._bn_affine(blk_p["bn1"], blk_b["bn1"])
        xs = jax.nn.relu(y * fd._tile4(s1) + fd._tile4(t1)).astype(bf)
        k2 = fd.s2d_kernel(blk_p["conv2"]["kernel"]).astype(bf)
        y = fd._conv(xs, k2)
        s2, t2 = fd._bn_affine(blk_p["bn2"], blk_b["bn2"])
        xs = jax.nn.relu(y * fd._tile4(s2) + fd._tile4(t2)).astype(bf)
        head = dp["seg_head"]
        kh = fd.s2d_kernel(head["kernel"]).astype(bf)
        y = fd._conv(xs, kh) + fd._tile4(head["bias"].astype(jnp.float32))
        return fd.depth_to_space(y).astype(jnp.float32)

    combos = [
        ("flax-enc + old-dec (r2 grid path)", flax_encode, decode_old),
        ("flax-enc + new-dec", flax_encode,
         lambda f: fd.decode_fast(variables, f, bf)),
        ("func-enc + old-dec", func_encode, decode_old),
        ("func-enc + new-dec (current)", func_encode,
         lambda f: fd.decode_fast(variables, f, bf)),
    ]
    for name, enc, dec in combos:
        fn = jax.jit(lambda a, enc=enc, dec=dec: dec(enc(a)))
        bench(name, fn, x)

    print("done", flush=True)


if __name__ == "__main__":
    main()
