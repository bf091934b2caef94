"""Training-step device throughput (patches/s) for the hybrid trainer.

The inference path is benchmarked exhaustively (bench.py); this measures
the other hot path — the reference's consistent trainer recipe
(train_cellularity.py:86-108 → make_hybrid_train_step) — steady-state on
device with donated state and no per-step host sync:

  * sweep batch size at the production 512² tile
  * f32 vs mixed-precision (bf16 conv/matmul compute, f32 params/BN)
  * MFU against ~3× the analytic forward FLOPs (bwd ≈ 2× fwd for convs)

Usage: nohup python scripts/bench_train.py > /tmp/bench_train.log 2>&1 &
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


def make_batch(b: int, tile: int, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    batch = {
        "image": rng.randn(b, tile, tile, 3).astype(np.float32),
        "seg_label": rng.randint(0, 4, (b, tile, tile)).astype(np.int32),
        "cls_label": np.tile(np.array([1, -1], np.int32), b // 2),
        "reg_label": rng.rand(b).astype(np.float32),
        "is_cls": np.tile(np.array([1.0, 0.0], np.float32), b // 2),
        "is_reg": np.tile(np.array([0.0, 1.0], np.float32), b // 2),
        "is_seg": np.tile(np.array([0.0, 1.0], np.float32), b // 2),
    }
    from wsiseg_tpu.data.patches import seg_labels_s2d
    batch["seg_label_s2d"] = seg_labels_s2d(batch["seg_label"])
    return {k: jax.device_put(v) for k, v in batch.items()}


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step
    from wsiseg_tpu.utils.profiling import (dense_forward_flops,
                                            detect_peak_tflops)

    platform = jax.devices()[0].platform
    print("platform:", platform, flush=True)
    tile = 512
    peak = detect_peak_tflops()
    fwd_tflop = dense_forward_flops("resnet18", tile, tile, 4) / 1e12
    step_tflop_per_patch = 3.0 * fwd_tflop

    for dtype in ("bfloat16", "float32"):
        cfg = default_config(tile_w=tile, tile_h=tile,
                             compute_dtype=dtype, norm_dtype="float32",
                             lr=1e-4)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        tx = build_optimizer(cfg)
        step = jax.jit(make_hybrid_train_step(model, tx, cfg),
                       donate_argnums=0)
        for b in (16, 32, 64):
            try:
                # step donates its state arg, so hand each config a fresh
                # copy of the init variables (donation deletes the
                # originals).
                state = TrainState.create(
                    jax.tree_util.tree_map(jnp.copy, variables), tx)
                batch = make_batch(b, tile)
                rng = jax.random.PRNGKey(1)
                state, m = step(state, batch, rng)     # compile + warm
                state, m = step(state, batch, rng)
                float(m["loss"])
                iters = 10
                t0 = time.time()
                for _ in range(iters):
                    state, m = step(state, batch, rng)
                float(m["loss"])                       # drain the queue
                dt = (time.time() - t0) / iters
                pps = b / dt
                tflops = pps * step_tflop_per_patch
                print(f"hybrid {dtype:8s} b={b:3d}: {dt * 1e3:7.1f} ms/step  "
                      f"{pps:8.1f} patches/s  {tflops:6.1f} TFLOP/s  "
                      f"mfu {tflops / peak:.3f}", flush=True)
                del state, batch
            except Exception as e:   # OOM / transient remote-compile 500s
                print(f"hybrid {dtype:8s} b={b:3d}: FAILED {e!r:.120}",
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
