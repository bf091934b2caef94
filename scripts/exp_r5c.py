"""Device-side stem-pack cost: the raw-u8 fused dispatch pays ~166 ms for
pack_for_stem2_device's u8 (hin, wc4, 12)->(hin, 12, wc4) transpose
(rawpack 2,699 p/s vs packed 10,207, BENCH r3 check). A/B pack variants
IN-GRAPH (full fused raw dispatch), per the standalone-timing caveat.

Usage: nohup python scripts/exp_r5c.py > /tmp/exp_r5c.log 2>&1 &
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


def _synthetic_level2(w, h, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(120, 255, (h // 64, w // 64, 3), np.uint8)
    img = np.kron(base, np.ones((64, 64, 1), np.uint8))
    return np.ascontiguousarray(img[:h, :w])


def _canvas(img_u8, mean, h, w):
    """Shared pack preamble: pad-colored canvas with the image pasted at
    (3, 3); returns (canvas (hin, win, 3) u8, hin, wc4)."""
    from wsiseg_tpu.ops.pallas_stem import stem2_geometry
    hin, wc4, _ = stem2_geometry(h // 2, w // 2)
    win = 4 * wc4
    pad_rgb = jnp.clip(jnp.round(255.0 * jnp.asarray(mean)), 0,
                       255).astype(jnp.uint8)
    canvas = jnp.broadcast_to(pad_rgb, (hin, win, 3))
    img = img_u8[:hin - 3, :win - 3]
    return jax.lax.dynamic_update_slice(canvas, img, (3, 3, 0)), hin, wc4


def pack_v0(img_u8, mean, h, w):
    """current: reshape + u8 transpose(0,2,1) + pad 12->16"""
    canvas, hin, wc4 = _canvas(img_u8, mean, h, w)
    packed = canvas.reshape(hin, wc4, 12).transpose(0, 2, 1)
    return jnp.pad(packed, ((0, 0), (0, 4), (0, 0)))


def pack_v1(img_u8, mean, h, w):
    """pad 12->16 lanes FIRST, then one (..,wc4,16)->(..,16,wc4) u8 transpose"""
    canvas, hin, wc4 = _canvas(img_u8, mean, h, w)
    packed = jnp.pad(canvas.reshape(hin, wc4, 12), ((0, 0), (0, 0), (0, 4)))
    return packed.transpose(0, 2, 1)


def pack_v2(img_u8, mean, h, w):
    """widen u8->i32, transpose in 32-bit, narrow back"""
    canvas, hin, wc4 = _canvas(img_u8, mean, h, w)
    packed = canvas.reshape(hin, wc4, 12).astype(jnp.int32)
    packed = packed.transpose(0, 2, 1).astype(jnp.uint8)
    return jnp.pad(packed, ((0, 0), (0, 4), (0, 0)))


def pack_v3(img_u8, mean, h, w):
    """12 u8 lane-slices -> stack on a new sublane axis (no big transpose)"""
    canvas, hin, wc4 = _canvas(img_u8, mean, h, w)
    flat = canvas.reshape(hin, wc4 * 12)
    cols = [flat[:, j::12] for j in range(12)]
    cols += [jnp.zeros_like(cols[0])] * 4
    return jnp.stack(cols, axis=1)


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import plan_slide
    from wsiseg_tpu.infer.engine import DenseInferenceEngine
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.slides.reader import VirtualPyramidSlide
    import wsiseg_tpu.models.infer_fast as infer_fast

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16",
                         infer_batch_size=128)
    level2 = _synthetic_level2(4096, 3072)
    slide = VirtualPyramidSlide({2: level2}, num_levels=3)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    engine = DenseInferenceEngine(model, variables, cfg)
    plan = plan_slide("bench", slide, cfg, mask_cache_dir=None)

    # parity of the variants vs v0 (tiny shapes, CPU-free: run on TPU once)
    small = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (70, 70, 3), np.uint8))
    ref = np.asarray(pack_v0(small, cfg.dataset_mean, 64, 64))
    for name, fn in (("v1", pack_v1), ("v2", pack_v2), ("v3", pack_v3)):
        got = np.asarray(fn(small, cfg.dataset_mean, 64, 64))
        print(f"{name} parity: {'OK' if np.array_equal(ref, got) else 'FAIL'}",
              flush=True)

    base = engine.device_throughput(plan, mode="fcn", iters=3)
    print(f"packed x1 : {base['patches_per_sec']:8.1f} p/s "
          f"({base['sec_per_slide']*1e3:.1f} ms)", flush=True)

    for name, fn in (("v0", pack_v0), ("v1", pack_v1), ("v2", pack_v2),
                     ("v3", pack_v3)):
        orig = infer_fast.pack_for_stem2_device
        infer_fast.pack_for_stem2_device = fn
        try:
            engine._sharded_cache = {}    # drop memoized fused runners
            r = engine.device_throughput(plan, mode="fcn_raw", iters=3)
            print(f"raw {name}  : {r['patches_per_sec']:8.1f} p/s "
                  f"({r['sec_per_slide']*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"raw {name}  : FAILED {e!r:.140}", flush=True)
        finally:
            infer_fast.pack_for_stem2_device = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
