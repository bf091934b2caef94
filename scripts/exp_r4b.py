"""Round-3 (cont.): train-mode stage breakdown at b32 @512².

Times fwd and grad of encoder / decoder / heads separately to locate the
lane-starved stage (suspect: decoder tail — 32/16-ch convs at 256²/512²).
Also times the decoder per block by truncating the channel list.

Usage: nohup python scripts/exp_r4b.py > /tmp/exp_r4b.log 2>&1 &
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


def bench(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:56s} {dt * 1e3:8.1f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {e!r:.140}", flush=True)
        return None


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.resnet import ResNetEncoder
    from wsiseg_tpu.models.unet import UNetDecoder
    from wsiseg_tpu.models.ynet import init_ynet

    print("platform:", jax.devices()[0].platform, flush=True)
    b, tile = 32, 512
    cfg = default_config(tile_w=tile, tile_h=tile, compute_dtype="bfloat16",
                         norm_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    img = jax.device_put(
        np.random.RandomState(0).randn(b, tile, tile, 3).astype(np.float32))

    enc = ResNetEncoder(arch="resnet18", dtype=jnp.bfloat16,
                        norm_dtype=jnp.float32)
    ev = {"params": variables["params"]["encoder"],
          "batch_stats": variables["batch_stats"]["encoder"]}

    @jax.jit
    def enc_fwd(v, x):
        out, mut = enc.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    feats = enc_fwd(ev, img)
    feats = jax.tree_util.tree_map(jnp.copy, feats)

    dec = UNetDecoder(num_classes=4, dtype=jnp.bfloat16,
                      norm_dtype=jnp.float32)
    dv = {"params": variables["params"]["decoder"],
          "batch_stats": variables["batch_stats"]["decoder"]}

    @jax.jit
    def dec_fwd(v, f):
        out, mut = dec.apply(v, f, train=True, mutable=["batch_stats"])
        return out

    t_enc = bench("enc fwd (train)", enc_fwd, ev, img)
    t_dec = bench("dec fwd (train)", dec_fwd, dv, feats)

    # grads: sum-of-output scalar losses isolate stage bwd cost
    @jax.jit
    def enc_grad(v, x):
        def f(vv):
            out, _ = enc.apply(vv, x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
        return jax.grad(f)(v)

    @jax.jit
    def dec_grad(v, f):
        def g(vv, ff):
            out, _ = dec.apply(vv, ff, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(g, argnums=(0, 1))(v, f)

    bench("enc fwd+bwd (train)", enc_grad, ev, img)
    bench("dec fwd+bwd (train)", dec_grad, dv, feats)

    # per-block decoder cost: truncate decoder_channels and feed the same
    # pyramid (later blocks = tail). Block i runs at 2^(i+1)x the c5 res.
    for nblocks in (1, 2, 3, 4, 5):
        chans = (256, 128, 64, 32, 16)[:nblocks]
        d = UNetDecoder(num_classes=4, decoder_channels=chans,
                        dtype=jnp.bfloat16, norm_dtype=jnp.float32)
        v = d.init(jax.random.PRNGKey(0), feats, train=False)

        @jax.jit
        def dfwd(vv, ff):
            out, _ = d.apply(vv, ff, train=True, mutable=["batch_stats"])
            return out

        @jax.jit
        def dgrad(vv, ff):
            def g(vv2, ff2):
                out, _ = d.apply(vv2, ff2, train=True,
                                 mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(g, argnums=(0, 1))(vv, ff)

        bench(f"dec[{nblocks} blocks] fwd", dfwd, v, feats)
        bench(f"dec[{nblocks} blocks] fwd+bwd", dgrad, v, feats)
    print("done", flush=True)


if __name__ == "__main__":
    main()
