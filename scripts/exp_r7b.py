"""b128 Unet step split (enc grad / +dec / +loss / full step) + in-graph
stem cin-pad probe.

exp_r7a found: encoder grad b128 = 81 ms of the 278 ms step; pool bwd is
bandwidth-bound (max==avg); stem wgrad micro drops 13.1 -> 9.1 ms when
Cin pads 3 -> 4. This script (a) locates the remaining ~197 ms, and
(b) checks the cin-pad win survives in a realistic stem+bn+relu+pool
subgraph where the pad op itself is paid.

Usage: nohup python scripts/exp_r7b.py > /tmp/exp_r7b.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import flax.linen as nn
import jax.numpy as jnp

from bench_train import make_batch  # noqa: E402


def _timed(fn, *args, iters=10):
    o = fn(*args)
    o = fn(*args)
    jax.block_until_ready(o)
    float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    t0 = time.time()
    for _ in range(iters):
        o = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    return (time.time() - t0) / iters


def step_split(bs: int = 128, tile: int = 512):
    from wsiseg_tpu import losses
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train import steps
    from wsiseg_tpu.train.state import TrainState

    cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    batch = make_batch(bs, tile)  # already device arrays + seg_label_s2d
    rng = jax.random.PRNGKey(1)

    def encode(p, x):
        feats, _ = model.apply({"params": p, "batch_stats": stats},
                               x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": rng}, method=YNet.encode)
        return feats

    def fwd(p, x):
        out, _ = model.apply({"params": p, "batch_stats": stats},
                             x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": rng})
        return out

    def make_grad(loss_fn):
        @jax.jit
        def step(p, b):
            return jax.grad(lambda pp: loss_fn(pp, b))(p)
        return step

    def enc_loss(p, b):
        return sum(jnp.mean(jnp.square(f.astype(jnp.float32)))
                   for f in encode(p, b["image"]))

    def seg_mean(p, b):
        return jnp.mean(jnp.square(fwd(p, b["image"])["seg"]
                                   .astype(jnp.float32)))

    def seg_xent(p, b):
        out = fwd(p, b["image"])
        if out.get("seg_s2d") is not None:
            return losses.cross_entropy_s2d(out["seg"], b["seg_label_s2d"])
        return losses.cross_entropy(out["seg"], b["seg_label"])

    print(f"== b{bs} step split ==", flush=True)
    for name, lf in [("enc grad", enc_loss), ("enc+dec grad", seg_mean),
                     ("enc+dec+xent grad", seg_xent)]:
        try:
            dt = _timed(make_grad(lf), params, batch)
            print(f"  {name:20s}: {dt * 1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"  {name:20s}: FAILED {e!r:.120}", flush=True)

    # full production step (grads + adam + BN stats + metrics)
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    hybrid = steps.make_hybrid_train_step(model, tx, cfg)

    @jax.jit
    def full(s, b, r):
        return hybrid(s, b, r)

    try:
        def run(s, b):
            s2, m = full(s, b, rng)
            return s2.params
        dt = _timed(run, state, batch)
        print(f"  {'full hybrid step':20s}: {dt * 1e3:7.1f} ms "
              f"({bs / dt:.1f} p/s)", flush=True)
    except Exception as e:
        print(f"  full hybrid step    : FAILED {e!r:.120}", flush=True)


def stem_pad_ingraph(bs: int = 128, tile: int = 512):
    """stem conv+bn+relu+pool grad, cin=3 native vs pad-to-4 in-graph."""
    print(f"== stem chain grad b{bs}, cin3 vs padded-cin4 ==", flush=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (bs, tile, tile, 3), jnp.bfloat16)
    k3 = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    def chain(kk, x):
        y = jax.lax.conv_general_dilated(
            x, kk, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        m = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
        y = (y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        y = (y * scale + bias).astype(jnp.bfloat16)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def g3(kk, x):
        return jax.grad(chain)(kk, x)

    @jax.jit
    def g4(kk, x):
        def lf(kk2):
            k4 = jnp.pad(kk2, ((0, 0), (0, 0), (0, 1), (0, 0)))
            x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
            return chain(k4, x4)
        return jax.grad(lf)(kk)

    for name, fn in [("cin3 native", g3), ("cin4 padded", g4)]:
        try:
            dt = _timed(fn, k3, img)
            print(f"  {name}: {dt * 1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {e!r:.120}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    step_split(128)
    stem_pad_ingraph(128)
    print("done", flush=True)


if __name__ == "__main__":
    main()
