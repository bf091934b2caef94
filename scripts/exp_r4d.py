"""Round-3 (cont.): post-s2d-tail train-step breakdown at b32 @512².

With the decoder tail in cell domains (exp_r4c: step 219->115 ms) locate
the next hot stage: encoder sub-stages (stem / layer1 / layers2-4), the
remaining native decoder blocks 0-2, losses, and heads. Also retries the
larger batches and a bf16-BN variant.

Usage: nohup python scripts/exp_r4d.py > /tmp/exp_r4d.log 2>&1 &
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

    # encoder fwd+bwd with a loss that actually uses every output (sum of
    # squares — sum alone lets XLA drop most of the backward)
    @jax.jit
    def enc_grad(v, x):
        def f(vv):
            out, _ = enc.apply(vv, x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                       for o in out)
        return jax.grad(f)(v)

    bench("enc fwd (train)", enc_fwd, ev, img)
    bench("enc fwd+bwd (sq-loss)", enc_grad, ev, img)

    # s2d-tail decoder fwd / fwd+bwd
    for s2d in (False, True):
        dec = UNetDecoder(num_classes=4, dtype=jnp.bfloat16,
                          norm_dtype=jnp.float32, s2d_tail=s2d)
        dv = {"params": variables["params"]["decoder"],
              "batch_stats": variables["batch_stats"]["decoder"]}

        @jax.jit
        def dec_grad(v, f):
            def g(vv, ff):
                out, _ = dec.apply(vv, ff, train=True,
                                   mutable=["batch_stats"])
                return jnp.sum(jnp.square(out))
            return jax.grad(g, argnums=(0, 1))(v, f)

        @jax.jit
        def dec_fwd(v, f):
            out, _ = dec.apply(v, f, train=True, mutable=["batch_stats"])
            return out

        bench(f"dec[s2d={int(s2d)}] fwd", dec_fwd, dv, feats)
        bench(f"dec[s2d={int(s2d)}] fwd+bwd", dec_grad, dv, feats)

    # full hybrid steps: retry b=96/128 (HTTP 500s were transient),
    # and a norm_dtype=bf16 variant at b=32
    from bench_train import make_batch
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    for norm_dtype, batches in (("float32", (96, 128)), ("bfloat16", (32,))):
        cfg2 = default_config(tile_w=tile, tile_h=tile,
                              compute_dtype="bfloat16",
                              norm_dtype=norm_dtype, lr=1e-4,
                              train_s2d_tail=True)
        model2, variables2 = init_ynet(cfg2, jax.random.PRNGKey(0))
        tx = build_optimizer(cfg2)
        step = jax.jit(make_hybrid_train_step(model2, tx, cfg2),
                       donate_argnums=0)
        for bb in batches:
            try:
                state = TrainState.create(
                    jax.tree_util.tree_map(jnp.copy, variables2), tx)
                batch = make_batch(bb, tile)
                rng = jax.random.PRNGKey(1)
                state, m = step(state, batch, rng)
                state, m = step(state, batch, rng)
                float(m["loss"])
                t0 = time.time()
                for _ in range(10):
                    state, m = step(state, batch, rng)
                float(m["loss"])
                dt = (time.time() - t0) / 10
                print(f"step norm={norm_dtype} b={bb:3d}: {dt * 1e3:7.1f} ms"
                      f"  {bb / dt:7.1f} p/s  loss {float(m['loss']):.4f}",
                      flush=True)
                del state, batch
            except Exception as e:
                print(f"step norm={norm_dtype} b={bb:3d}: FAILED {e!r:.140}",
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
