"""Probe: seg xent directly on s2d(4) logits vs d2s + class-major.

The s2d train tail ends with depth_to_space(4) -> f32 (537 MB at b128) and
the class-major loss then transposes it again. If the loss consumes the
s2d layout, both materializations (and their backwards) disappear — IF the
in-s2d class reduction doesn't recreate the 4-lane pathological layout.

Variants (value_and_grad wrt the s2d logits, b128 @ 512², C=4):
  base : d2s(4) -> f32 -> class-major xent on (B,512,512,4)   [current]
  varB : s2d labels; per-class strided lane slices k::4
  varC : s2d labels; reshape (...,16,4), reduce minor axis
  varD : class-major lane order (c*16+j); contiguous 16-lane slices

Usage: nohup python scripts/exp_r4g.py > /tmp/exp_r4g.log 2>&1 &
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

C = 4
F = 4
F2 = 16


def s2d_labels(t):
    b, h, w = t.shape
    return (t.reshape(b, h // F, F, w // F, F)
            .transpose(0, 1, 3, 2, 4).reshape(b, h // F, w // F, F2))


def d2s(x, f):
    b, h, w, c = x.shape
    c0 = c // (f * f)
    return (x.reshape(b, h, w, f, f, c0).transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h * f, w * f, c0))


def xent_cm(logits, t):
    lp = jnp.moveaxis(logits.astype(jnp.float32), -1, 0)
    m = jnp.max(lp, axis=0)
    lse = jnp.log(jnp.sum(jnp.exp(lp - m), axis=0)) + m
    pick = jnp.zeros(t.shape, lp.dtype)
    for k in range(C):
        pick = pick + jnp.where(t == k, lp[k], 0)
    return jnp.mean(lse - pick)


def base(x, t):
    return xent_cm(d2s(x.astype(jnp.float32), F), t)


def varB(x, ts):  # strided lane slices (lane order j*C + c)
    xs = [x[..., k::C].astype(jnp.float32) for k in range(C)]
    m = xs[0]
    for k in range(1, C):
        m = jnp.maximum(m, xs[k])
    lse = jnp.log(sum(jnp.exp(xk - m) for xk in xs)) + m
    pick = jnp.zeros(ts.shape, jnp.float32)
    for k in range(C):
        pick = pick + jnp.where(ts == k, xs[k], 0)
    return jnp.mean(lse - pick)


def varC(x, ts):  # reshape minor
    b, h, w, _ = x.shape
    xr = x.reshape(b, h, w, F2, C).astype(jnp.float32)
    m = jnp.max(xr, axis=-1)
    lse = jnp.log(jnp.sum(jnp.exp(xr - m[..., None]), axis=-1)) + m
    pick = jnp.zeros(ts.shape, jnp.float32)
    for k in range(C):
        pick = pick + jnp.where(ts == k, xr[..., k], 0)
    return jnp.mean(lse - pick)


def varD(x, ts):  # class-major lanes: contiguous 16-lane slices
    xs = [x[..., k * F2:(k + 1) * F2].astype(jnp.float32) for k in range(C)]
    m = xs[0]
    for k in range(1, C):
        m = jnp.maximum(m, xs[k])
    lse = jnp.log(sum(jnp.exp(xk - m) for xk in xs)) + m
    pick = jnp.zeros(ts.shape, jnp.float32)
    for k in range(C):
        pick = pick + jnp.where(ts == k, xs[k], 0)
    return jnp.mean(lse - pick)


def bench(name, fn, *args, iters=10):
    try:
        g = jax.jit(jax.value_and_grad(fn))
        v, gr = g(*args)
        float(v)
        t0 = time.time()
        for _ in range(iters):
            v, gr = g(*args)
        float(v + jnp.sum(gr.ravel()[:1].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:40s} {dt * 1e3:8.1f} ms  val {float(v):.5f}", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {e!r:.140}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    b, tile = 128, 512
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.randn(b, tile // F, tile // F, F2 * C)
                       .astype(jnp.bfloat16))
    t_full = jax.device_put(
        rs.randint(0, C, (b, tile, tile)).astype(np.int32))
    ts = jax.jit(s2d_labels)(t_full)
    float(jnp.sum(ts[:1, :1, :1, :1]))

    bench("base: d2s + class-major", base, x, t_full)
    bench("varB: strided k::4 slices", varB, x, ts)
    bench("varC: reshape (...,16,4) minor", varC, x, ts)
    bench("varD: c-major 16-lane slices", varD, x, ts)
    # label s2d cost itself (one-way, no grad)
    f = jax.jit(s2d_labels)
    f(t_full)
    t0 = time.time()
    for _ in range(10):
        out = f(t_full)
    float(jnp.sum(out[:1, :1, :1, :1].astype(jnp.float32)))
    print(f"{'labels s2d (fwd only)':40s} {(time.time() - t0) / 10 * 1e3:8.1f} ms",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
