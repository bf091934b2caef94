"""exp_r8d: can the cached step's ~31.5 ms prep (gather + u8→f32
normalize + jitter; exp_r8c) shrink by doing the prep in bf16?

Variants at b128 @512² (production bf16 model config):
  A. production cached step (f32 normalize+jitter, model casts to bf16)
  B. bf16 prep: u8 → bf16 /255 → bf16 jitter → bf16 normalize (halves
     the prep's HBM traffic; the model consumes bf16 anyway)
  C. A with jitter disabled (reference point from exp_r8c)

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
from wsiseg_tpu.train.device_cache import DeviceEpochCache, gather_batch
from wsiseg_tpu.train.loop import host_step_keys
from wsiseg_tpu.ops.color import batch_color_jitter, normalize

TB = 128
ROWS = 256


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, iters=6):
    out = fn()
    out = fn()
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         lr=1e-4)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    vars_keep = jax.tree_util.tree_map(jnp.copy, variables)
    base = make_hybrid_train_step(model, tx, cfg)
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
    k0, _ = host_step_keys(9, 0, 0)

    def run(step_fn, tag):
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, vars_keep), tx)
        jstep = jax.jit(step_fn)
        holder = {"s": state}

        def call():
            holder["s"], m = jstep(holder["s"], cache.arrays, idx, k0)
            return m["loss"]

        ms = timeit(call)
        print(f"{tag}: {ms:7.1f} ms  ({TB/ms*1e3:6.1f} p/s)")
        return ms

    # A: production prep (f32)
    def step_a(state, arrays, ix, rng):
        sub, pp = jax.random.split(rng)
        return base(state, gather_batch(arrays, ix, cfg, rng=pp,
                                        train=True), sub)

    # B: bf16 prep
    def step_b(state, arrays, ix, rng):
        sub, pp = jax.random.split(rng)
        b = {k: jnp.take(v, ix, axis=0) for k, v in arrays.items()}
        img = b["image"].astype(jnp.bfloat16) / 255.0
        img = batch_color_jitter(img, pp)
        b["image"] = normalize(img, cfg.dataset_mean, cfg.dataset_std)
        for k in ("seg_label", "seg_label_s2d", "cls_label"):
            if k in b:
                b[k] = b[k].astype(jnp.int32)
        return base(state, b, sub)

    # C: no jitter (exp_r8c reference point)
    def step_c(state, arrays, ix, rng):
        sub, _ = jax.random.split(rng)
        return base(state, gather_batch(arrays, ix, cfg, rng=None,
                                        train=False), sub)

    a = run(step_a, "A f32 prep (production)")
    b = run(step_b, "B bf16 prep            ")
    c = run(step_c, "C no jitter            ")
    print(f"bf16-prep delta: {a-b:+.1f} ms; jitter cost: {a-c:.1f} ms")


if __name__ == "__main__":
    main()
