"""Round-3n: where does the hybrid train step's time go?

bench_train showed the step runs far below the batched-tile forward's
conv rate. Truncation ablation (one methodology everywhere — see
exp_r3h): fwd-only → +bwd → +optimizer, then dtype/structure variants.

Usage: nohup python scripts/exp_r3n.py > /tmp/exp_r3n.log 2>&1 &
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

from bench_train import make_batch  # noqa: E402  (same dir)


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
    print(f"{name:46s} {dt * 1e3:8.1f} ms", flush=True)
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

    for dtype, norm in (("bfloat16", "float32"), ("bfloat16", "bfloat16")):
        cfg = default_config(tile_w=tile, tile_h=tile, compute_dtype=dtype,
                             norm_dtype=norm, lr=1e-4)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        tx = build_optimizer(cfg)
        state = TrainState.create(variables, tx)
        tag = f"[{dtype}/{norm}]"

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
            return l_cls + l_reg + l_seg, mutated

        @jax.jit
        def t0_fwd(params, bstats, batch, rng):
            return loss_fn(params, bstats, batch, rng)[0]

        @jax.jit
        def t0_fwd_infer(params, bstats, batch):
            out = model.apply({"params": params, "batch_stats": bstats},
                              batch["image"], train=False)
            return out["seg"]

        @jax.jit
        def t1_grad(params, bstats, batch, rng):
            g, _ = jax.grad(loss_fn, has_aux=True)(params, bstats, batch, rng)
            return g

        @jax.jit
        def t1_seg_only(params, bstats, batch, rng):
            def lf(p, bs, bt, r):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, bt["image"],
                    train=True, mutable=["batch_stats"], rngs={"dropout": r})
                return losses.cross_entropy(out["seg"], bt["seg_label"]), mut
            g, _ = jax.grad(lf, has_aux=True)(params, bstats, batch, rng)
            return g

        step = jax.jit(make_hybrid_train_step(model, tx, cfg))

        bench(f"{tag} fwd infer-mode (running BN)", t0_fwd_infer,
              state.params, state.batch_stats, batch)
        bench(f"{tag} fwd train-mode + losses", t0_fwd,
              state.params, state.batch_stats, batch, rng)
        bench(f"{tag} + backward (grad)", t1_grad,
              state.params, state.batch_stats, batch, rng)
        bench(f"{tag} seg-only grad", t1_seg_only,
              state.params, state.batch_stats, batch, rng)
        bench(f"{tag} full step (grad+adam)",
              lambda s, bt, r: step(s, bt, r)[0].params, state, batch, rng)
    print("done", flush=True)


if __name__ == "__main__":
    main()
