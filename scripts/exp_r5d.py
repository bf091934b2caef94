"""FPN train-step truncation ablation (b32 @512²): where do the 59 ms go?
Stages: encoder-only grad, +decoder, +seg loss (full hybrid step had
540 p/s in exp_r4i). Each truncated loss takes mean() of the stage output
so the backward sweeps the same subgraph.

Usage: nohup python scripts/exp_r5d.py > /tmp/exp_r5d.log 2>&1 &
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
    from wsiseg_tpu import losses
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState

    print("platform:", jax.devices()[0].platform, flush=True)
    tile, bs = 512, 32
    cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4,
                         model_name="FPN")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    batch = make_batch(bs, tile)

    def time_step(name, loss_fn):
        @jax.jit
        def step(state, b, rng):
            def lf(params):
                return loss_fn(params, state.batch_stats, b, rng)
            g = jax.grad(lf)(state.params)
            new_p = jax.tree_util.tree_map(lambda p, gg: p - 1e-4 * gg,
                                           state.params, g)
            return state.replace(params=new_p)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables), tx)
        rng = jax.random.PRNGKey(1)
        try:
            s = step(state, batch, rng)
            s = step(s, batch, rng)
            jax.block_until_ready(s.params)
            float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
            t0 = time.time()
            for _ in range(10):
                s = step(s, batch, rng)
            float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))
            dt = (time.time() - t0) / 10
            print(f"{name:28s}: {dt * 1e3:7.1f} ms  {bs / dt:7.1f} p/s",
                  flush=True)
        except Exception as e:
            print(f"{name:28s}: FAILED {e!r:.140}", flush=True)

    def apply(params, stats, img, rng, method=None):
        out, _ = model.apply({"params": params, "batch_stats": stats},
                             img, train=True, mutable=["batch_stats"],
                             rngs={"dropout": rng},
                             **({"method": method} if method else {}))
        return out

    def enc_loss(params, stats, b, rng):
        feats = apply(params, stats, b["image"], rng, method=YNet.encode)
        return sum(jnp.mean(jnp.square(f.astype(jnp.float32)))
                   for f in feats)

    def seg_mean_loss(params, stats, b, rng):
        out = apply(params, stats, b["image"], rng)
        return jnp.mean(jnp.square(out["seg"]))

    def seg_xent_loss(params, stats, b, rng):
        out = apply(params, stats, b["image"], rng)
        return losses.cross_entropy(out["seg"], b["seg_label"])

    time_step("encoder-only (mse)", enc_loss)
    time_step("enc+decoder (mse on seg)", seg_mean_loss)
    time_step("enc+decoder+xent", seg_xent_loss)
    print("done", flush=True)


if __name__ == "__main__":
    main()
