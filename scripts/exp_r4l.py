"""Linknet s2d-tail train batch sweep (b32/64/128 @512²) — find the best
operating point (Unet's best was b128: 461 p/s, exp_r4h).

Usage: nohup python scripts/exp_r4l.py > /tmp/exp_r4l.log 2>&1 &
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

from bench_train import make_batch  # noqa: E402


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    print("platform:", jax.devices()[0].platform, flush=True)
    tile = 512
    for bs in (32, 64, 128):
        try:
            cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4,
                                 model_name="Linknet")
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
            print(f"b={bs:4d}: {dt * 1e3:7.1f} ms  {bs / dt:7.1f} p/s"
                  f"  loss {float(m['loss']):.4f}", flush=True)
            del state, batch, step, model, variables
        except Exception as e:
            print(f"b={bs}: FAILED {e!r:.140}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
