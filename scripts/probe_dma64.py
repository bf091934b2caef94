"""Can a manual Mosaic DMA read row/col-sliced windows from an HBM ref
whose lane (channel) dim is 64 (not 128)? Decides whether the encoder
layer-1 chain needs a padded c1.

Usage: nohup python scripts/probe_dma64.py > /tmp/probe_dma64.log 2>&1 &
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


def run(name, c, br=8, wc=512, h=1536, w=2048):
    def kern(x_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * br, br + 2), pl.ds(j * wc, wc + 8)],
            scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[1:1 + br, 1:1 + wc] * 2.0

    x = jnp.ones((h, w, c), jnp.bfloat16)
    fn = jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(h // br, w // wc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((br, wc, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((br + 2, wc + 8, c), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x))
    try:
        out = fn(x)
        ok = float(jnp.sum(out[:4, :4].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(5):
            out = fn(x)
        float(jnp.sum(out[:2, :2].astype(jnp.float32)))
        dt = (time.time() - t0) / 5
        gb = 2 * h * w * c * 2 / 1e9
        print(f"{name:28s} OK sum4x4={ok:.0f}  {dt*1e3:7.2f} ms "
              f"{gb/dt:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    run("c=128 (control)", 128)
    run("c=64", 64)
    run("c=32", 32)
    print("done", flush=True)


if __name__ == "__main__":
    main()
