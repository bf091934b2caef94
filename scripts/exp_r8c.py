"""exp_r8c: where do the cached-epoch step's extra ~170 ms go?

bench.py (fixed) measures: device-resident hybrid step 278 ms (b128@512²,
pre-normalized f32 batch) vs cached-epoch step 450 ms (gather + u8→f32
normalize + color jitter + widen + SAME step). This probe splits the gap
on-chip:

  A. baseline step on a pre-normalized f32 device batch (bench section 1)
  B. cached step, full production config (gather+normalize+jitter+step)
  C. cached step, jitter off (normalize train=False — isolates jitter)
  D. gather+preprocess ONLY (no model step — isolates the prep subgraph;
     standalone-subgraph timings are unreliable in absolute terms
     (CLAUDE.md), so read C-B and A-B deltas first)

Run alone on an idle host (one-TPU-process rule)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from wsiseg_tpu.config import default_config
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.train.state import TrainState
from wsiseg_tpu.train.steps import make_hybrid_train_step
from wsiseg_tpu.train.device_cache import (DeviceEpochCache, gather_batch,
                                           make_cached_hybrid_train_step)
from wsiseg_tpu.data.patches import seg_labels_s2d

TB = 128
ROWS = 256


def _sync(out):
    # strict scalar-fetch sync (block_until_ready is unreliable over the
    # relay — CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=6):
    out = fn(*args)   # compile
    out = fn(*args)   # warm
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    vars_keep = jax.tree_util.tree_map(jnp.copy, variables)
    rng = np.random.RandomState(7)

    # ---- A: baseline step, pre-normalized f32 batch ----
    seg_lab = rng.randint(0, cfg.num_classes, (TB, 512, 512)).astype(np.int32)
    fbatch = {
        "image": jax.device_put(rng.randn(TB, 512, 512, 3).astype(np.float32)),
        "seg_label": jax.device_put(seg_lab),
        "seg_label_s2d": jax.device_put(seg_labels_s2d(seg_lab)),
        "cls_label": jax.device_put(np.tile(np.array([1, -1], np.int32), TB // 2)),
        "reg_label": jax.device_put(rng.rand(TB).astype(np.float32)),
        "is_cls": jax.device_put(np.tile(np.array([1.0, 0.0], np.float32), TB // 2)),
        "is_reg": jax.device_put(np.tile(np.array([0.0, 1.0], np.float32), TB // 2)),
        "is_seg": jax.device_put(np.tile(np.array([0.0, 1.0], np.float32), TB // 2)),
    }
    step = jax.jit(make_hybrid_train_step(model, tx, cfg))
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, vars_keep), tx)
    rkey = jax.random.PRNGKey(1)

    def run_a():
        nonlocal state
        state, m = step(state, fbatch, rkey)
        return m["loss"]

    a_ms = timeit(lambda: run_a(), iters=6)
    print(f"A baseline step (f32 batch)            : {a_ms:7.1f} ms")

    # ---- cache build ----
    rng_c = np.random.RandomState(12)

    def batches(n_rows, rows_per=64):
        for _ in range(n_rows // rows_per):
            sl = rng_c.randint(0, cfg.num_classes,
                               (rows_per, 512, 512)).astype(np.int32)
            yield {
                "image": rng_c.randint(0, 255, (rows_per, 512, 512, 3)
                                       ).astype(np.uint8),
                "seg_label": sl,
                "cls_label": np.tile(np.array([1, -1], np.int32), rows_per // 2),
                "reg_label": rng_c.rand(rows_per).astype(np.float32),
                "is_cls": np.tile(np.array([1.0, 0.0], np.float32), rows_per // 2),
                "is_reg": np.tile(np.array([0.0, 1.0], np.float32), rows_per // 2),
                "is_seg": np.tile(np.array([0.0, 1.0], np.float32), rows_per // 2),
            }

    cache = DeviceEpochCache.build(batches(ROWS), cfg)
    idx = jax.device_put(next(cache.index_batches(TB, seed=1)))

    # ---- B: full cached step ----
    cstep = jax.jit(make_cached_hybrid_train_step(model, tx, cfg))
    state_b = TrainState.create(jax.tree_util.tree_map(jnp.copy, vars_keep), tx)
    rkey_b = jax.random.PRNGKey(4)

    def run_b():
        nonlocal state_b
        state_b, m = cstep(state_b, cache.arrays, idx, rkey_b)
        return m["loss"]

    b_ms = timeit(lambda: run_b(), iters=6)
    print(f"B cached step (gather+norm+jitter+step): {b_ms:7.1f} ms  (+{b_ms-a_ms:.1f})")

    # ---- C: cached step without jitter ----
    base = make_hybrid_train_step(model, tx, cfg)

    def cstep_nojit_fn(state, arrays, ix, r):
        sub, _ = jax.random.split(r)
        return base(state, gather_batch(arrays, ix, cfg, rng=None,
                                        train=False), sub)

    cstep_nj = jax.jit(cstep_nojit_fn)
    state_c = TrainState.create(jax.tree_util.tree_map(jnp.copy, vars_keep), tx)
    rkey_c = jax.random.PRNGKey(5)

    def run_c():
        nonlocal state_c
        state_c, m = cstep_nj(state_c, cache.arrays, idx, rkey_c)
        return m["loss"]

    c_ms = timeit(lambda: run_c(), iters=6)
    print(f"C cached step, NO jitter               : {c_ms:7.1f} ms  (jitter = {b_ms-c_ms:.1f})")

    # ---- D: prep subgraph only (unreliable standalone; directional) ----
    prep = jax.jit(lambda arrays, ix, r: gather_batch(arrays, ix, cfg,
                                                      rng=r, train=True))
    d_ms = timeit(lambda: prep(cache.arrays, idx, jax.random.PRNGKey(6))["image"],
                  iters=6)
    print(f"D gather+norm+jitter standalone        : {d_ms:7.1f} ms (directional)")


if __name__ == "__main__":
    main()
