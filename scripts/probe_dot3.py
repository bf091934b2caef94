"""Characterize the out-block pipeline floor seen in probe_dot2 G1
(29 us/step for (8,1024,64)bf16 blocks on a (1536,2048,64) output).

Usage: nohup python scripts/probe_dot3.py > /tmp/probe_dot3.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x[:8, :8, 0].astype(jnp.float32)))


def out_floor(name, h, w, n, br, wc, dtype=jnp.bfloat16, semantics=None,
              iters=5):
    ny, nx = h // br, w // wc
    gb = h * w * n * np.dtype(dtype).itemsize / 1e9

    def kern(o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)

    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics)

    fn = jax.jit(lambda: pl.pallas_call(
        kern, grid=(ny, nx),
        out_specs=pl.BlockSpec((br, wc, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, n), dtype),
        **params,
    )())
    try:
        out = fn()
        sync(out)
    except Exception as e:
        print(f"{name:46s} FAILED {str(e)[:100]}", flush=True)
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms  {gb/dt:6.1f} GB/s "
          f"({dt*1e6/(ny*nx):5.1f} us/step, {ny*nx} steps)", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    H, W = 1536, 2048
    out_floor("A n64 br8 wc1024 bf16", H, W, 64, 8, 1024)
    out_floor("B n128 br8 wc1024 bf16", H, W, 128, 8, 1024)
    out_floor("C n64 br8 wc2048 bf16", H, W, 64, 8, 2048)
    out_floor("D n64 br32 wc2048 bf16", H, W, 64, 32, 2048)
    out_floor("E n64 br8 wc1024 parallel", H, W, 64, 8, 1024,
              semantics=("parallel", "parallel"))
    out_floor("F n64 br128 wc2048 bf16", H, W, 64, 128, 2048)
    out_floor("G n128 br32 wc2048 bf16", H, W, 128, 32, 2048)
    print("done", flush=True)


if __name__ == "__main__":
    main()
