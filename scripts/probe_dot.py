"""Microbench: isolate the conv9 inner-loop cost on resident VMEM data.

Grid repeats the same block (no DMA variation) so this measures pure
compute: dot forms, accumulate adds, slice copies.

Usage: nohup python scripts/probe_dot.py > /tmp/probe_dot.log 2>&1 &
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

BR, WC, C, N = 8, 1024, 128, 64
STEPS = 384          # ~b4conv1 volume: 384 blocks of (8,1024) pixels
FLOPS = STEPS * 9 * BR * WC * C * N * 2


def sync(x):
    return float(jnp.sum(x[:8, :8].astype(jnp.float32)))


def run(name, kern, extra_scratch=(), flops=FLOPS, iters=5):
    x = jnp.asarray(np.random.RandomState(0).randn(BR + 2, WC + 16, C),
                    jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).randn(9, C, N), jnp.bfloat16)

    fn = jax.jit(lambda x, w: pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((BR + 2, WC + 16, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, WC, N), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR, WC, N), jnp.float32),
        scratch_shapes=list(extra_scratch),
    )(x, w))
    try:
        out = fn(x, w)
        sync(out[0])
    except Exception as e:
        print(f"{name:36s} FAILED {str(e)[:90]}", flush=True)
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn(x, w)
    sync(out[0])
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TF/s",
          flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    def v1(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            a = x_ref[:, dx:dx + WC]
            for dy in range(3):
                p = jax.lax.dot_general(a[dy:dy + BR], w_ref[3 * dy + dx],
                                        (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        o_ref[:] = acc

    run("V1 3copies-9dot3d-8adds", v1)

    def v2(x_ref, w_ref, o_ref):
        acc = None
        for dy in range(3):
            a = jnp.concatenate([x_ref[dy:dy + BR, dx:dx + WC]
                                 for dx in range(3)], axis=2)
            wk = jnp.concatenate([w_ref[3 * dy + dx] for dx in range(3)],
                                 axis=0)
            p = jax.lax.dot_general(a, wk, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        o_ref[:] = acc

    run("V2 kstack384-3dot-2adds", v2)

    def v3(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            a = x_ref[:, dx:dx + WC]
            for dy in range(3):
                a2 = a[dy:dy + BR].reshape(BR * WC, C)
                p = jax.lax.dot_general(a2, w_ref[3 * dy + dx],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        o_ref[:] = acc.reshape(BR, WC, N)

    run("V3 2dreshape-9dot", v3)

    def v4(x_ref, w_ref, o_ref):
        p = jax.lax.dot_general(x_ref[0:BR, 0:WC], w_ref[0],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = p

    run("V4 single-dot (1/9 flops)", v4, flops=FLOPS // 9)

    def v5(x_ref, w_ref, o_ref):
        acc = None
        for t in range(9):
            p = jax.lax.dot_general(x_ref[0:BR, 0:WC], w_ref[t],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        o_ref[:] = acc

    run("V5 9dot-noshift-8adds", v5)

    def v6(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            a = x_ref[:, dx:dx + WC]
            s = a[0:BR] + a[1:BR + 1] + a[2:BR + 2]
            p = jax.lax.dot_general(s, w_ref[dx],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        o_ref[:] = acc

    run("V6 3dot-only (wrong math; 1/3)", v6, flops=FLOPS // 3)

    print("done", flush=True)


if __name__ == "__main__":
    main()
