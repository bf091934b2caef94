"""Probe which Mosaic value ops lower on this TPU: shifts/rolls/slices/
reshapes/matmul forms needed by the conv9 kernel.

Usage: python scripts/probe_mosaic.py 2>&1 | grep -E "^P[0-9]+"
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, body, in_shape=(16, 64, 128), out_shape=None,
          dtype=jnp.bfloat16, out_dtype=None):
    out_shape = out_shape or in_shape
    x = jnp.asarray(np.random.RandomState(0).randn(*in_shape), dtype)

    def kern(x_ref, o_ref):
        o_ref[:] = body(x_ref)

    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype or dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        out.block_until_ready()
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {msg}", flush=True)
        return False


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    # P1: 3D sublane value slice at odd offset
    probe("P1 3d-sublane-slice", lambda r: r[:, 1:49, :],
          out_shape=(16, 48, 128))
    # P2: 3D lane rotate
    probe("P2 3d-lane-roll", lambda r: pltpu.roll(r[:], 5, 2))
    # P3: 3D sublane static roll via jnp.roll
    probe("P3 3d-sublane-jnproll", lambda r: jnp.roll(r[:], 5, 1))
    # P4: 2D sublane rotate
    probe("P4 2d-sublane-roll", lambda r: pltpu.roll(r[:], 5, 0),
          in_shape=(64, 128))
    # P5: dot_general 3D x 2D contracting last dim
    w = jnp.asarray(np.random.randn(128, 32), jnp.bfloat16)
    probe("P5 dot3d-lastdim",
          lambda r: jax.lax.dot_general(
              r[:], w, (((2,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          out_shape=(16, 64, 32), out_dtype=jnp.float32)
    # P6: value reshape merging outer+sublane then 2D matmul
    probe("P6 reshape-merge-mm",
          lambda r: jax.lax.dot_general(
              r[:].reshape(16 * 64, 128), w, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          out_shape=(16 * 64, 32), out_dtype=jnp.float32)
    # P7: merged-2D sublane roll (shift W within merged rows)
    probe("P7 merge-sublane-roll",
          lambda r: pltpu.roll(r[:].reshape(16 * 64, 128), 3, 0))
    # wait: out_shape mismatch; redo properly below
    probe("P7b merge-sublane-roll",
          lambda r: pltpu.roll(r[:].reshape(16 * 64, 128), 3, 0
                               ).reshape(16, 64, 128))
    # P8: 3D transpose (swap sublane/lane)
    probe("P8 transpose-sub-lane", lambda r: jnp.transpose(r[:], (0, 2, 1)),
          out_shape=(16, 128, 64))
    # P9: dot_general contracting sublane (dim 1) of 3D with 2D
    w2 = jnp.asarray(np.random.randn(64, 32), jnp.bfloat16)
    probe("P9 dot3d-middim",
          lambda r: jax.lax.dot_general(
              r[:], w2, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          out_shape=(16, 128, 32), out_dtype=jnp.float32)
    # P10: concat of two sublane slices (emulated shift)
    probe("P10 concat-shift",
          lambda r: jnp.concatenate([r[:, 1:, :], r[:, :1, :]], axis=1))

    print("done", flush=True)


if __name__ == "__main__":
    main()
