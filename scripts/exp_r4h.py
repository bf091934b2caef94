"""A/B: s2d-domain seg loss (train_s2d_loss) in the full hybrid step.

Usage: nohup python scripts/exp_r4h.py > /tmp/exp_r4h.log 2>&1 &
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
    from wsiseg_tpu.utils.profiling import (dense_forward_flops,
                                            detect_peak_tflops)

    print("platform:", jax.devices()[0].platform, flush=True)
    tile = 512
    peak = detect_peak_tflops()
    fwd_tflop = dense_forward_flops("resnet18", tile, tile, 4) / 1e12

    for s2d_loss in (False, True):
        for bs in (32, 128):
            try:
                cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4,
                                     train_s2d_tail=True,
                                     train_s2d_loss=s2d_loss)
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
                iters = 10
                t0 = time.time()
                for _ in range(iters):
                    state, m = step(state, batch, rng)
                float(m["loss"])
                dt = (time.time() - t0) / iters
                pps = bs / dt
                tfl = pps * 3.0 * fwd_tflop
                print(f"s2d_loss={int(s2d_loss)} b={bs:3d}: "
                      f"{dt * 1e3:7.1f} ms  {pps:7.1f} p/s  "
                      f"{tfl:5.1f} TFLOP/s  mfu {tfl / peak:.3f}  "
                      f"loss {float(m['loss']):.4f}", flush=True)
                del state, batch, step, model, variables
            except Exception as e:
                print(f"s2d_loss={int(s2d_loss)} b={bs:3d}: FAILED "
                      f"{e!r:.140}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
