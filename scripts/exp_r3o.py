"""Round-3o: locate the train-step overheads found by exp_r3n.

exp_r3n (b=16, 512², bf16/f32): infer fwd 41.9 ms, train fwd+losses
106.4, +bwd 117.9, +adam 182.8. Two anomalies to localize:
  (a) +64 ms for train-mode BN stats — encoder or decoder?
  (b) +65 ms for the optimizer update — unfused per-tensor kernels?
     probe optax.flatten(tx) and an sgd floor.

Usage: nohup python scripts/exp_r3o.py > /tmp/exp_r3o.log 2>&1 &
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
import optax

from bench_train import make_batch  # noqa: E402


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    tile, b = 512, 16
    batch = make_batch(b, tile)
    rng = jax.random.PRNGKey(1)

    cfg = default_config(tile_w=tile, tile_h=tile, compute_dtype="bfloat16",
                         norm_dtype="float32", lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))

    # ---- (a) where does train-mode BN time go? ----
    def fwd(method, train):
        @jax.jit
        def f(params, bstats, x):
            kw = dict(train=train)
            if train:
                out, _ = model.apply({"params": params, "batch_stats": bstats},
                                     x, mutable=["batch_stats"],
                                     method=method, **kw)
            else:
                out = model.apply({"params": params, "batch_stats": bstats},
                                  x, method=method, **kw)
            return out
        return f

    p, bs = variables["params"], variables["batch_stats"]
    x = batch["image"]
    for method in ("encode", "segment", None):
        mname = method or "full"
        bench(f"fwd {mname} infer", fwd(method, False), p, bs, x)
        bench(f"fwd {mname} TRAIN", fwd(method, True), p, bs, x)

    # ---- (b) optimizer update cost ----
    def step_time(tag, tx):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables), tx)
        step = jax.jit(make_hybrid_train_step(model, tx, cfg))
        bench(f"full step [{tag}]",
              lambda s, bt, r: step(s, bt, r)[0].params, state, batch, rng)

    step_time("adam chain (prod)", build_optimizer(cfg))
    step_time("adam FLAT", optax.flatten(build_optimizer(cfg)))
    step_time("sgd plain (floor)", optax.sgd(1e-4))
    step_time("sgd FLAT", optax.flatten(optax.sgd(1e-4)))
    print("done", flush=True)


if __name__ == "__main__":
    main()
