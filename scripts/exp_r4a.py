"""Round-3 (cont.): train-step headroom hunt after the class-major fix.

Questions:
  1. Where do the ~119 ms at b32 go now? (model fwd / +loss / grad / +update)
  2. Does remat (jax.checkpoint on the loss fn) fix the b64 spill regression
     and net a throughput win (more MXU occupancy per step)?
  3. Is there a better batch point with remat (48/64/96)?

Usage: nohup python scripts/exp_r4a.py > /tmp/exp_r4a.log 2>&1 &
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


def bench(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:56s} {dt * 1e3:8.1f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {e!r:.140}", flush=True)
        return None


def main():
    from wsiseg_tpu import losses
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

    cfg = default_config(tile_w=tile, tile_h=tile, compute_dtype="bfloat16",
                         norm_dtype="float32", lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)

    b = 32
    batch = make_batch(b, tile)
    rng = jax.random.PRNGKey(1)
    params = variables["params"]
    bstats = variables["batch_stats"]

    # ---- 1. bisect the step at b32 -------------------------------------
    @jax.jit
    def fwd_model(p, bs, img, key):
        out, mut = model.apply({"params": p, "batch_stats": bs}, img,
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": key})
        return out["seg"], out["cls"], out["reg"]

    def loss_fn(p, bs, bt, key):
        out, mut = model.apply({"params": p, "batch_stats": bs}, bt["image"],
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": key})
        l = (losses.cross_entropy(out["cls"], bt["cls_label"],
                                  ignore_index=-1, sample_weight=bt["is_cls"])
             + losses.mse(out["reg"][:, 0], bt["reg_label"],
                          sample_weight=bt["is_reg"])
             + losses.cross_entropy(out["seg"], bt["seg_label"],
                                    sample_weight=bt["is_seg"]))
        return l, mut["batch_stats"]

    fwd_loss = jax.jit(loss_fn)
    grad_only = jax.jit(jax.grad(loss_fn, has_aux=True))
    step = jax.jit(make_hybrid_train_step(model, tx, cfg), donate_argnums=0)

    t_fwd = bench("b32 model fwd (train mode)", fwd_model, params, bstats,
                  batch["image"], rng)
    t_loss = bench("b32 fwd + losses", fwd_loss, params, bstats, batch, rng)
    t_grad = bench("b32 value_and_grad", grad_only, params, bstats, batch, rng)

    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)
    new_state, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        new_state, m = step(new_state, batch, rng)
    float(m["loss"])
    t_step = (time.time() - t0) / iters
    print(f"{'b32 full step (donated)':56s} {t_step * 1e3:8.1f} ms",
          flush=True)
    del new_state, state

    if t_grad and t_step:
        print(f"  -> update overhead {1e3 * (t_step - t_grad):.1f} ms, "
              f"bwd/fwd {(t_grad - t_loss) / max(t_fwd, 1e-9):.2f}x",
              flush=True)

    # ---- 2. remat variants ---------------------------------------------
    def make_step(remat: bool):
        lf = jax.checkpoint(loss_fn) if remat else loss_fn

        def stp(state, bt, key):
            (g, new_bs) = jax.grad(lf, has_aux=True)(
                state.params, state.batch_stats, bt, key)
            import optax as _ox
            upd, new_opt = tx.update(g, state.opt_state, state.params)
            return state.replace(params=_ox.apply_updates(state.params, upd),
                                 batch_stats=new_bs, opt_state=new_opt,
                                 step=state.step + 1)
        return jax.jit(stp, donate_argnums=0)

    for remat in (False, True):
        for bb in (32, 48, 64, 96):
            try:
                st = TrainState.create(
                    jax.tree_util.tree_map(jnp.copy, variables), tx)
                bt = make_batch(bb, tile)
                stp = make_step(remat)
                st = stp(st, bt, rng)
                jax.block_until_ready(st.step)
                st = stp(st, bt, rng)
                float(jnp.sum(st.step.astype(jnp.float32)))
                t0 = time.time()
                for _ in range(8):
                    st = stp(st, bt, rng)
                float(jnp.sum(st.step.astype(jnp.float32)))
                dt = (time.time() - t0) / 8
                pps = bb / dt
                tfl = pps * 3.0 * fwd_tflop
                print(f"step remat={int(remat)} b={bb:3d}: "
                      f"{dt * 1e3:7.1f} ms  {pps:7.1f} p/s  "
                      f"{tfl:5.1f} TFLOP/s  mfu {tfl / peak:.3f}", flush=True)
                del st, bt
            except Exception as e:
                print(f"step remat={int(remat)} b={bb:3d}: FAILED {e!r:.140}",
                      flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
