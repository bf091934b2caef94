"""Measure the XLA glue ops between fold-decoder kernels (transposes,
channel pads, concats, upsamples) — in-graph chains are 10x slower than
standalone, so the glue must be where decode_fold's 46 ms goes.

Usage: nohup python scripts/profile_glue.py > /tmp/profile_glue.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.models.fast_decoder import (depth_to_space, space_to_depth,
                                            upsample2x)


def bench(name, fn, *args, iters=10, gb=None):
    try:
        out = fn(*args)
        float(jnp.sum(out[:2, :2].astype(jnp.float32)))
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:2, :2].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    extra = f"  {gb / dt:6.0f} GB/s" if gb else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    def arr(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)
                           ).astype(jnp.bfloat16)

    c1 = arr(1, 1536, 2048, 64)
    bench("s2d c1 (1536x2048x64 -> 256)", jax.jit(space_to_depth), c1,
          gb=2 * 0.403)
    c2 = arr(1, 768, 1024, 64)
    bench("s2d c2 (768x1024x64)", jax.jit(space_to_depth), c2,
          gb=2 * 0.101)
    xs = arr(1, 768, 1024, 128)
    bench("d2s x3 (768x1024x128)", jax.jit(depth_to_space), xs,
          gb=2 * 0.201)
    y16 = jnp.asarray(rng.randn(1, 1536, 2048, 16).astype(np.float32))
    bench("d2s head f32 (1536x2048x16)", jax.jit(depth_to_space), y16,
          gb=2 * 0.402)
    p64 = arr(768, 1024, 64)
    bench("pad 64->128 (768x1024)",
          jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 64)))), p64,
          gb=0.101 + 0.201)
    a64 = arr(768, 1024, 64)
    b256 = arr(768, 1024, 256)
    bench("concat 64+256 (768x1024)",
          jax.jit(lambda a, b: jnp.concatenate([a, b], -1)), a64, b256,
          gb=2 * 0.322)
    x1 = arr(1, 192, 256, 256)
    bench("upsample2x (192x256x256)", jax.jit(upsample2x), x1,
          gb=0.025 + 0.1)
    # s2d variants exploiting the FREE (H, W, 64) -> (H, W/2, 128) view
    # (row-major bitcast): s2d == row-parity interleave on the viewed
    # array, with 128-lane operands instead of 64
    def s2d_via_view(x):                     # (1, H, W, 64) -> (H/2, W/2, 256)
        _, h, w, c = x.shape
        v = x.reshape(h, w // 2, 2 * c)      # free view
        return jnp.concatenate([v[0::2], v[1::2]], axis=-1)

    bench("s2d c1 via W-view + row concat", jax.jit(s2d_via_view), c1,
          gb=2 * 0.403)

    def s2d_via_view_t(x):
        _, h, w, c = x.shape
        v = x.reshape(h // 2, 2, w // 2, 2 * c)
        return jnp.transpose(v, (0, 2, 1, 3)).reshape(h // 2, w // 2,
                                                      4 * c)
    bench("s2d c1 via W-view + transpose", jax.jit(s2d_via_view_t), c1,
          gb=2 * 0.403)

    # pad with interior halo (what conv_chain does spatially)
    xsp = arr(1536, 2048, 128)
    bench("spatial pad L=3 (1536x2048x128)",
          jax.jit(lambda a: jnp.pad(a, ((3, 11), (3, 37), (0, 0)))), xsp,
          gb=2 * 0.805)
    print("done", flush=True)


if __name__ == "__main__":
    main()
