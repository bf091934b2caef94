"""Stage breakdown of the b128/bf16-norm train step (post s2d-tail).

Encoder truncation sweep (stem, +layer1, ...), decoder, and the full step,
to locate the next hot block at the new sweet spot.

Usage: nohup python scripts/exp_r4f.py > /tmp/exp_r4f.log 2>&1 &
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


def bench(name, fn, *args, iters=8):
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
    from flax import linen as nn

    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.resnet import ResNetEncoder
    from wsiseg_tpu.models.unet import UNetDecoder
    from wsiseg_tpu.models.ynet import init_ynet

    print("platform:", jax.devices()[0].platform, flush=True)
    b, tile = 128, 512
    cfg = default_config(tile_w=tile, tile_h=tile, compute_dtype="bfloat16",
                         norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    img = jax.device_put(
        np.random.RandomState(0).randn(b, tile, tile, 3).astype(np.float32))

    enc = ResNetEncoder(arch="resnet18", dtype=jnp.bfloat16,
                        norm_dtype=jnp.bfloat16)
    ev = {"params": variables["params"]["encoder"],
          "batch_stats": variables["batch_stats"]["encoder"]}

    @jax.jit
    def enc_fwd(v, x):
        out, mut = enc.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    feats = enc_fwd(ev, img)
    feats = jax.tree_util.tree_map(jnp.copy, feats)

    @jax.jit
    def enc_grad(v, x):
        def f(vv):
            out, _ = enc.apply(vv, x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                       for o in out)
        return jax.grad(f)(v)

    bench("enc fwd (b128)", enc_fwd, ev, img)
    bench("enc fwd+bwd (b128)", enc_grad, ev, img)

    # encoder truncation: capture_intermediates lets us time prefixes via
    # a stop_gradient barrier? simpler: separate stem-only and stage convs
    # via a raw flax module sweep is overkill — instead time layer groups
    # with a squared-sum loss on each feature level (cumulative cost).
    for k in range(5):
        @jax.jit
        def enc_grad_k(v, x, k=k):
            def f(vv):
                out, _ = enc.apply(vv, x, train=True,
                                   mutable=["batch_stats"])
                # loss touches only levels deeper than k: XLA dead-code
                # eliminates shallower backward work? no — all levels feed
                # forward. Use the PREFIX: loss on level k alone means the
                # bwd only flows through stages up to k (deeper stages DCE).
                return jnp.sum(jnp.square(out[4 - k].astype(jnp.float32)))
            return jax.grad(f)(v)

        bench(f"enc fwd+bwd through c{k + 1} (prefix)", enc_grad_k, ev, img)

    dec = UNetDecoder(num_classes=4, dtype=jnp.bfloat16,
                      norm_dtype=jnp.bfloat16, s2d_tail=True)
    dv = {"params": variables["params"]["decoder"],
          "batch_stats": variables["batch_stats"]["decoder"]}

    @jax.jit
    def dec_grad(v, f):
        def g(vv, ff):
            out, _ = dec.apply(vv, ff, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(out))
        return jax.grad(g, argnums=(0, 1))(v, f)

    bench("dec[s2d] fwd+bwd (b128)", dec_grad, dv, feats)
    print("done", flush=True)


if __name__ == "__main__":
    main()
