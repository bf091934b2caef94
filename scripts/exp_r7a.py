"""Encoder-grad stage truncation (b32/b128 @512²): where do the 31.5 ms go?

exp_r5d showed encoder grad = 31.5 ms at b32 is the shared train floor
across all four decoder families. This slices it by stage: a loss on
feats[k] makes jax.grad sweep only stages up to k (unused stages are dead
code — jax.grad discards the primal, so XLA DCEs the untouched tail).

Stages (ResNetEncoder returns [c5,c4,c3,c2,c1]):
  c1            = stem conv+bn+relu                (idx 4)
  pool(c1)      = + 3×3/2 max pool (loss applies it manually)
  c2            = + layer1                         (idx 3)
  c3            = + layer2                         (idx 2)
  c4            = + layer3                         (idx 1)
  c5            = + layer4 (full encoder)          (idx 0)

Plus two micro-probes for the likely floors:
  stem-wgrad    : grad of a raw 7×7/2 conv wrt its kernel, Cin=3 vs
                  Cin=4-padded vs Cin=8-padded (lane-starved transposes).
  pool-bwd      : grad through max_pool (SelectAndScatter) vs avg_pool
                  vs a stride-2 2×2 max (cheap window).

Usage: nohup python scripts/exp_r7a.py > /tmp/exp_r7a.log 2>&1 &
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


def truncation(bs: int, tile: int = 512):
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet

    cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    img = jnp.asarray(make_batch(bs, tile)["image"])
    rng = jax.random.PRNGKey(1)

    def encode(p, x):
        feats, _ = model.apply({"params": p, "batch_stats": stats},
                               x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": rng}, method=YNet.encode)
        return feats

    def make_step(loss_of_feats):
        @jax.jit
        def step(p, x):
            def lf(pp):
                return loss_of_feats(encode(pp, x))
            return jax.grad(lf)(p)
        return step

    def msq(t):
        return jnp.mean(jnp.square(t.astype(jnp.float32)))

    cases = [
        ("c1 (stem)", lambda fs: msq(fs[4])),
        ("pool(c1)", lambda fs: msq(nn.max_pool(
            fs[4], (3, 3), (2, 2), padding=[(1, 1), (1, 1)]))),
        ("c2 (+layer1)", lambda fs: msq(fs[3])),
        ("c3 (+layer2)", lambda fs: msq(fs[2])),
        ("c4 (+layer3)", lambda fs: msq(fs[1])),
        ("c5 (full enc)", lambda fs: msq(fs[0])),
    ]
    print(f"== truncation b{bs} @{tile}² ==", flush=True)
    for name, lf in cases:
        try:
            dt = _timed(make_step(lf), params, img)
            print(f"  {name:16s}: {dt * 1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name:16s}: FAILED {e!r:.120}", flush=True)


def stem_wgrad(bs: int, tile: int = 512):
    print(f"== stem wgrad micro b{bs} ==", flush=True)
    key = jax.random.PRNGKey(0)
    for cin in (3, 4, 8):
        img = jax.random.normal(key, (bs, tile, tile, cin), jnp.bfloat16)
        k = jax.random.normal(key, (7, 7, cin, 64), jnp.bfloat16)

        @jax.jit
        def wg(kk, x):
            def lf(kk2):
                y = jax.lax.conv_general_dilated(
                    x, kk2, (2, 2), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.mean(jnp.square(y.astype(jnp.float32)))
            return jax.grad(lf)(kk)

        try:
            dt = _timed(wg, k, img)
            print(f"  cin={cin}: {dt * 1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  cin={cin}: FAILED {e!r:.120}", flush=True)


def pool_bwd(bs: int, tile: int = 512):
    print(f"== pool bwd micro b{bs} (input {tile//2}², 64ch) ==", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, tile // 2, tile // 2, 64), jnp.bfloat16)
    cases = {
        "max3x3s2": lambda t: nn.max_pool(
            t, (3, 3), (2, 2), padding=[(1, 1), (1, 1)]),
        "max2x2s2": lambda t: nn.max_pool(t, (2, 2), (2, 2)),
        "avg3x3s2": lambda t: nn.avg_pool(
            t, (3, 3), (2, 2), padding=[(1, 1), (1, 1)]),
    }
    for name, pool in cases.items():
        @jax.jit
        def g(t, pool=pool):
            def lf(tt):
                return jnp.mean(jnp.square(pool(tt).astype(jnp.float32)))
            return jax.grad(lf)(t)
        try:
            dt = _timed(g, x)
            print(f"  {name}: {dt * 1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {e!r:.120}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for bs in (32, 128):
        truncation(bs)
    stem_wgrad(32)
    pool_bwd(32)
    stem_wgrad(128)
    pool_bwd(128)
    print("done", flush=True)


if __name__ == "__main__":
    main()
