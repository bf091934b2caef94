"""Round-4c: unblock train b192 (round-3 VERDICT next #7).

b192 at 512² "failed to compile" in round 3 (the single-pass graph's
activations exceed HBM). Probes, hybrid step, bf16 + s2d tail (the
round-3 production config; b128 baseline 461 p/s):

  * b160 / b192 plain retry (post round-4 graph changes)
  * b192 / b256 with grad_accum 2 (microbatch scan halves peak activation
    memory; one optimizer update — the real trainer feature, steps.py)
  * b384 ga=3 for the scaling tail

Usage: nohup python scripts/exp_r6c.py > /tmp/exp_r6c.log 2>&1 &
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

from bench_train import make_batch  # noqa: E402 (same dir)


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    tile = 512
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)

    for b, ga in [(128, 1), (160, 1), (192, 1), (192, 2), (256, 2),
                  (384, 3)]:
        try:
            # donate_argnums=0 consumes the state's buffers — give every
            # config its own copy of the init variables
            vars_k = jax.tree_util.tree_map(jnp.array, variables)
            state = TrainState.create(vars_k, tx)
            step = jax.jit(make_hybrid_train_step(model, tx, cfg,
                                                  grad_accum=ga),
                           donate_argnums=0)
            batch = make_batch(b, tile)
            rng = jax.random.PRNGKey(1)
            state, m = step(state, batch, rng)
            state, m = step(state, batch, rng)
            float(m["loss"])
            t0 = time.time()
            iters = 6
            for _ in range(iters):
                state, m = step(state, batch, rng)
            float(m["loss"])
            dt = (time.time() - t0) / iters
            print(f"b{b} ga{ga}: {b / dt:8.1f} p/s   {dt * 1e3:7.1f} ms",
                  flush=True)
            del state, batch
        except Exception as e:
            print(f"b{b} ga{ga}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
