"""Linknet train-mode s2d decoder tail A/B on the real chip: hybrid step
b32 @512², tail off vs on (decoders._S2dLinknetTailBlock). Pre-fix
baseline: 253 p/s (exp_r4i — native tail, with class-major losses + bf16
norm already in).

Usage: nohup python scripts/exp_r4k.py > /tmp/exp_r4k.log 2>&1 &
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
    tile, bs = 512, 32
    for tail in (False, True):
        try:
            cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4,
                                 model_name="Linknet")
            cfg = cfg.replace(train_s2d_tail=tail, train_s2d_loss=tail)
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
            print(f"s2d_tail={tail!s:5s} b={bs}: {dt * 1e3:7.1f} ms"
                  f"  {bs / dt:7.1f} p/s  loss {float(m['loss']):.4f}",
                  flush=True)
            del state, batch, step, model, variables
        except Exception as e:
            print(f"s2d_tail={tail}: FAILED {e!r:.140}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
