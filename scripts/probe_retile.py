"""Probe: Mosaic support + cost of the (N, 64) -> (N/2, 128) value
reshape (sublane-pair merge), sublane-shift concat, and lane-half slices
inside a Pallas TPU kernel — the primitives the fused stem-maxpool-s2d
kernel needs. Tiny shapes so the compile is fast.

Usage: python scripts/probe_retile.py  (TPU; ~1-2 min)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, m_ref, o_ref, p_ref):
    x2 = x_ref[:]                         # (128, 128) bf16
    o_ref[:] = x2 + 0.0
    e = x2[:, :64]                        # lane-half slices
    o = x2[:, 64:]
    om1 = o * m_ref[:]                    # isolate: no roll
    p_ref[:] = jnp.maximum(jnp.maximum(om1, e), o)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(128, 128).astype(np.float32)).astype(jnp.bfloat16)
    m = jnp.ones((128, 1), jnp.bfloat16).at[0].set(0)

    t0 = time.time()
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((128, 128), jnp.bfloat16),
                   jax.ShapeDtypeStruct((128, 64), jnp.bfloat16)),
    )(x, m)
    o, p = jax.block_until_ready(out)
    print(f"compiled+ran in {time.time() - t0:.1f}s", flush=True)

    o_ref = np.asarray(x, np.float32)
    np.testing.assert_allclose(np.asarray(o, np.float32), o_ref, atol=1e-2)
    e, od = o_ref[:, :64], o_ref[:, 64:]
    m = np.ones((128, 1)); m[0] = 0
    om1 = od * m
    p_ref = np.maximum(np.maximum(om1, e), od)
    np.testing.assert_allclose(np.asarray(p, np.float32), p_ref, atol=1e-2)
    print("retile probe OK", flush=True)


if __name__ == "__main__":
    main()
