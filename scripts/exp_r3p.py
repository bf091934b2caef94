"""Round-3p: (1) does the class-major seg xent kill the +62 ms loss cost?
(2) bisect the grad(118) -> full step(183) gap — exp_r3o showed it is NOT
optimizer math (sgd floor == adam == flat adam == 182-183 ms).

Usage: nohup python scripts/exp_r3p.py > /tmp/exp_r3p.log 2>&1 &
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
    from wsiseg_tpu import losses
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
    p, bs = variables["params"], variables["batch_stats"]

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        l_cls = losses.cross_entropy(out["cls"], batch["cls_label"],
                                     ignore_index=-1,
                                     sample_weight=batch["is_cls"])
        l_reg = losses.mse(out["reg"][:, 0], batch["reg_label"],
                           sample_weight=batch["is_reg"])
        l_seg = losses.cross_entropy(out["seg"], batch["seg_label"],
                                     sample_weight=batch["is_seg"])
        return l_cls + l_reg + l_seg, mutated["batch_stats"]

    @jax.jit
    def fwd_loss(params, bstats, batch, rng):
        return loss_fn(params, bstats, batch, rng)[0]

    @jax.jit
    def grad_only(params, bstats, batch, rng):
        g, _ = jax.grad(loss_fn, has_aux=True)(params, bstats, batch, rng)
        return g

    @jax.jit
    def grad_sgd_params_only(params, bstats, batch, rng):
        g, _ = jax.grad(loss_fn, has_aux=True)(params, bstats, batch, rng)
        return jax.tree_util.tree_map(lambda x, gg: x - 1e-4 * gg.astype(x.dtype),
                                      params, g)

    @jax.jit
    def grad_sgd_params_stats(params, bstats, batch, rng):
        g, new_bs = jax.grad(loss_fn, has_aux=True)(params, bstats, batch, rng)
        newp = jax.tree_util.tree_map(lambda x, gg: x - 1e-4 * gg.astype(x.dtype),
                                      params, g)
        return newp, new_bs

    bench("fwd + NEW losses", fwd_loss, p, bs, batch, rng)
    bench("grad (NEW losses)", grad_only, p, bs, batch, rng)
    bench("grad -> sgd -> params only", grad_sgd_params_only, p, bs, batch, rng)
    bench("grad -> sgd -> params + batch_stats", grad_sgd_params_stats,
          p, bs, batch, rng)

    tx = build_optimizer(cfg)
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)
    step = jax.jit(make_hybrid_train_step(model, tx, cfg))
    bench("full hybrid step (NEW losses, adam)",
          lambda s, bt, r: step(s, bt, r)[0].params, state, batch, rng)

    # threaded-state variant: donate + carry state like the real loop
    step_d = jax.jit(make_hybrid_train_step(model, tx, cfg),
                     donate_argnums=0)
    state2 = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)
    state2, m = step_d(state2, batch, rng)
    float(m["loss"])
    t0 = time.time()
    for _ in range(10):
        state2, m = step_d(state2, batch, rng)
    float(m["loss"])
    print(f"{'full step donated+threaded':52s} {(time.time()-t0)*100:8.1f} ms",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
