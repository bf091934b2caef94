"""Train-step b128 @512² across the remaining decoder families (FPN,
PSPNet) — completes the operating-point table (Unet 461 p/s, Linknet 622,
scripts/exp_r4h/r4l.py).

Usage: nohup python scripts/exp_r5e.py > /tmp/exp_r5e.log 2>&1 &
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
    tile, bs = 512, 128
    for dec in ("FPN", "PSPNet"):
        try:
            cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4,
                                 model_name=dec)
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
            print(f"{dec:8s} b={bs}: {dt * 1e3:7.1f} ms  {bs / dt:7.1f} p/s"
                  f"  loss {float(m['loss']):.4f}", flush=True)
            del state, batch, step, model, variables
        except Exception as e:
            print(f"{dec:8s} b={bs}: FAILED {e!r:.140}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
