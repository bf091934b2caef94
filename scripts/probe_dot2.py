"""Probe the per-grid-step floor: manual DMA vs auto-pipelined blocks vs
unblocked overlapping windows, at the b4conv1 shape (1536x2048, 128->64).

Usage: nohup python scripts/probe_dot2.py > /tmp/probe_dot2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C, N = 1536, 2048, 128, 64
BR, WC = 8, 1024
NY, NX = H // BR, W // WC
FLOPS = H * W * 9 * C * N * 2


def sync(x):
    return float(jnp.sum(x[:8, :8, 0].astype(jnp.float32)))


def bench(name, fn, *args, iters=5, flops=FLOPS):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:40s} FAILED {str(e)[:110]}", flush=True)
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TF/s "
          f"({dt*1e6/(NY*NX):5.1f} us/step)", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(H + 2, W + 16, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(9, C, N) * 0.05, jnp.bfloat16)

    # G1: trivial kernel, real out blocks — out-pipeline floor
    def g1(o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)

    f1 = jax.jit(lambda: pl.pallas_call(
        g1, grid=(NY, NX),
        out_specs=pl.BlockSpec((BR, WC, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N), jnp.bfloat16),
    )())
    bench("G1 out-only floor", f1)

    # G2: auto in+out blocks, copy — io floor
    def g2(x_ref, o_ref):
        o_ref[:] = x_ref[:, :WC, :N] * 2.0

    f2 = jax.jit(lambda x: pl.pallas_call(
        g2, grid=(NY, NX),
        in_specs=[pl.BlockSpec((BR, WC + 16, C),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, WC, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N), jnp.bfloat16),
    )(x[:H]))
    bench("G2 auto io floor", f2)

    # G3: auto blocks + 9 dots (halo-less: perf-representative only)
    def g3(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            a = x_ref[:, dx:dx + WC]
            for dy in range(3):
                p = jax.lax.dot_general(
                    jnp.roll(a, dy, 0), w_ref[3 * dy + dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        o_ref[:] = acc.astype(o_ref.dtype)

    f3 = jax.jit(lambda x, w: pl.pallas_call(
        g3, grid=(NY, NX),
        in_specs=[pl.BlockSpec((BR, WC + 16, C), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, WC, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N), jnp.bfloat16),
    )(x[:H], w))
    bench("G3 auto blocks + 9 dots", f3)

    # G5: element-indexed overlapping windows (the real halo) + 9 dots
    def g5(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            a = x_ref[:, dx:dx + WC]
            for dy in range(3):
                p = jax.lax.dot_general(
                    a[dy:dy + BR], w_ref[3 * dy + dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        o_ref[:] = acc.astype(o_ref.dtype)

    f5 = jax.jit(lambda x, w: pl.pallas_call(
        g5, grid=(NY, NX),
        in_specs=[pl.BlockSpec(
            (pl.Element(BR + 2), pl.Element(WC + 16), C),
            lambda i, j: (i * BR, j * WC, 0),
            memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, WC, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N), jnp.bfloat16),
    )(x, w))
    bench("G5 element overlap + 9 dots", f5)

    print("done", flush=True)


if __name__ == "__main__":
    main()
