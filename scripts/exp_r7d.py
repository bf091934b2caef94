"""Decoder-grad stage split (b128 @512², production s2d tail + s2d loss).

exp_r7a split the encoder grad (81 ms of the 278 ms b128 step); the
decoder grad (~181 ms) was never stage-split. This slices it the same
way: loss on an intermediate decoder output makes jax.grad sweep only
stages up to it (the primal is discarded, later stages and their BN-stat
updates are returned nowhere, so XLA DCEs them).

Stage chain in the production train config (UNetDecoder s2d_tail +
s2d_logits, models/unet.py __call__):
  block0, block1   native DecoderBlocks (H/16, H/8 domains, 256/128 ch)
  block2..block4   _S2dTailBlock cell-domain blocks
  seg_head         _S2dConv s2d(4) head
Per-stage cost = successive differences. Also prints the per-stage
incremental TFLOP/s estimate context is manual (see log notes); the goal
is to find whether any stage is far from the ~87 TFLOP/s measured conv
ceiling, or whether the decoder grad is roofline-bound like the encoder
(exp_r7a verdict: layers at conv roofline, pool bwd pure bandwidth).

Usage: nohup python scripts/exp_r7d.py > /tmp/exp_r7d.log 2>&1 &
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


def main(bs: int = 128, tile: int = 512):
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import YNet, init_ynet

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = default_config(tile_w=tile, tile_h=tile, lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    img = jnp.asarray(make_batch(bs, tile)["image"])
    rng = jax.random.PRNGKey(1)

    # constant feats: encoder runs under stop_gradient inside the jit so
    # only the decoder sweep is timed (encoder fwd cost is shared by every
    # case and subtracts out of the successive differences).
    def feats_of(x):
        feats, _ = model.apply({"params": params, "batch_stats": stats},
                               x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": rng}, method=YNet.encode)
        return [jax.lax.stop_gradient(f) for f in feats]

    # standalone decoder module mirroring YNet.setup / build_ynet exactly
    # (incl. norm_dtype-follows-compute: f32 BN here would inflate every
    # native-BN stage vs production)
    from wsiseg_tpu.models.unet import UNetDecoder
    dec = UNetDecoder(num_classes=cfg.num_classes,
                      dtype=jnp.dtype(cfg.compute_dtype),
                      param_dtype=jnp.float32,
                      norm_dtype=jnp.dtype(cfg.norm_dtype),
                      s2d_tail=cfg.train_s2d_tail,
                      s2d_logits=cfg.train_s2d_loss)
    p_dec = params["decoder"]
    s_dec = stats.get("decoder", {})

    def msq(t):
        return jnp.mean(jnp.square(t.astype(jnp.float32)))

    def make_step(stage):
        @jax.jit
        def step(pd, x):
            fs = feats_of(x)

            def lf(pd2):
                if stage == "full":
                    out, _ = dec.apply(
                        {"params": pd2, "batch_stats": s_dec}, fs,
                        train=True, mutable=["batch_stats"])
                    return msq(out)
                _, st = dec.apply(
                    {"params": pd2, "batch_stats": s_dec}, fs,
                    train=True, mutable=["batch_stats", "intermediates"],
                    capture_intermediates=True)
                inter = st["intermediates"][stage]["__call__"][0]
                return msq(inter)

            return jax.grad(lf)(pd)
        return step

    stages = ["block0", "block1", "block2", "block3", "block4",
              "seg_head", "full"]
    print(f"== decoder grad truncation b{bs} @{tile}² "
          f"(s2d_tail={cfg.train_s2d_tail}) ==", flush=True)
    prev = None
    for st in stages:
        try:
            dt = _timed(make_step(st), p_dec, img) * 1e3
            inc = "" if prev is None else f"  (+{dt - prev:6.2f})"
            print(f"  {st:9s}: {dt:7.2f} ms{inc}", flush=True)
            prev = dt
        except Exception as e:
            print(f"  {st:9s}: FAILED {e!r:.160}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
