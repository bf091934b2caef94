"""Round-4d: grouped multi-slide dispatch on GRID mode (round-3 VERDICT
next #8).

The fcn fast path gained +8% from slides_in_flight (x6: 11.9k -> 12.9k p/s)
because its per-dispatch sync overhead is a visible share of a ~50 ms
dispatch. Grid mode runs ~420 ms/slide — the same trick should be flat, but
it was never measured and grid is the path every parity claim runs through.

Probe: N resident slides in ONE dispatch. The per-slide fori_loop body is
unchanged (gather -> forward -> overlap-add); the loop spans N*n_batches
iterations with slide index i // n_batches selecting the stacked image and
canvas stripe. Postprocess vmapped over slides. Reports per-slide steady
state for N in {1, 2, 4}.

Usage: nohup python scripts/exp_r6d.py > /tmp/exp_r6d.log 2>&1 &
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

from bench import _synthetic_level2  # noqa: E402


def main():
    from functools import partial

    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         infer_batch_size=128)
    level2 = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: level2}, num_levels=3)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)
    assert plan is not None

    n = len(plan.grid)
    hs, ws = plan.stitch_hw
    h2, w2 = plan.canvas_hw
    img = np.asarray(plan.slide.read_level(cfg.scan_level))
    mask = jnp.asarray(engine._resize_mask_to(plan.mask, (h2, w2)))
    bs = engine.batch
    xs_p, ys_p, valid = (jnp.asarray(a) for a in engine._pad_grid(
        plan.grid.xs, plan.grid.ys, bs))
    n_batches = xs_p.shape[0]
    print(f"{n} tiles, {n_batches} batches of {bs}", flush=True)

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(leaf[..., :1, :1].astype(jnp.float32)))

    @partial(jax.jit, static_argnames=("n_slides",))
    def run_grouped(variables, imgs, ys_all, xs_all, valid_all, masks,
                    n_slides):
        canvas = jnp.zeros((n_slides, hs, ws, cfg.num_classes), jnp.float32)

        def body(i, cv):
            s = i // n_batches
            b = i % n_batches
            im = jax.lax.dynamic_index_in_dim(imgs, s, 0, keepdims=False)
            cvs = jax.lax.dynamic_index_in_dim(cv, s, 0, keepdims=False)
            cvs = engine._seg_tile_batch(variables, im, cvs, ys_all[b],
                                         xs_all[b], valid_all[b])
            return jax.lax.dynamic_update_index_in_dim(cv, cvs, s, 0)

        canvas = jax.lax.fori_loop(0, n_slides * n_batches, body, canvas)
        return jax.vmap(lambda cv, m: engine._post(cv, m, out_hw=(h2, w2))
                        )(canvas, masks)

    for n_slides in (1, 2, 4):
        imgs = jnp.stack([jnp.asarray(img)] * n_slides)
        masks = jnp.stack([mask] * n_slides)
        out = run_grouped(engine.variables, imgs, ys_p, xs_p, valid,
                          masks, n_slides)
        sync(out)
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            out = run_grouped(engine.variables, imgs, ys_p, xs_p, valid,
                              masks, n_slides)
        sync(out)
        dt = (time.time() - t0) / (iters * n_slides)
        print(f"grid x{n_slides}: {n / dt:8.1f} p/s   "
              f"{dt * 1e3:7.1f} ms/slide", flush=True)

    # reference: the production single-slide path through device_throughput
    r = engine.device_throughput(plan, mode="grid", iters=3)
    print(f"grid production: {r['patches_per_sec']:8.1f} p/s   "
          f"{r['sec_per_slide'] * 1e3:7.1f} ms/slide", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
