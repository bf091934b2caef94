"""Train-step tile-size scaling: 256²/512²/1024² at equal pixel budgets.

Usage: nohup python scripts/exp_r4j.py > /tmp/exp_r4j.log 2>&1 &
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

from bench_train import make_batch  # noqa: E402


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    for tile, bs in ((256, 128), (256, 512), (512, 128), (1024, 8),
                     (1024, 32)):
        try:
            cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4)
            model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
            tx = build_optimizer(cfg)
            step = jax.jit(make_hybrid_train_step(model, tx, cfg),
                           donate_argnums=0)
            state = TrainState.create(
                jax.tree_util.tree_map(jnp.copy, variables), tx)
            batch = make_batch(bs, tile)
            rng = jax.random.PRNGKey(1)
            state, m = step(state, batch, rng)
            state, m = step(state, batch, rng)
            float(m["loss"])
            t0 = time.time()
            for _ in range(10):
                state, m = step(state, batch, rng)
            float(m["loss"])
            dt = (time.time() - t0) / 10
            mpx = bs * tile * tile / dt / 1e6
            print(f"tile={tile:4d} b={bs:3d}: {dt * 1e3:7.1f} ms  "
                  f"{bs / dt:7.1f} p/s  {mpx:7.0f} Mpx/s  "
                  f"loss {float(m['loss']):.4f}", flush=True)
            del state, batch, step, model, variables
        except Exception as e:
            print(f"tile={tile:4d} b={bs:3d}: FAILED {e!r:.140}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
