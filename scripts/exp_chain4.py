"""Isolate the constant ~135 ms per-call overhead of conv_chain (all four
stage groups cost the same regardless of FLOPs — exp_chain4 bisects on the
fastest-compiling group, dec2 @384x512).

Usage: nohup python scripts/exp_chain4.py > /tmp/exp_chain4.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import wsiseg_tpu.ops.conv9 as c9
from wsiseg_tpu.ops.conv9 import conv9, conv_chain


def bench(name, fn, *args, iters=10, flops=None):
    t0 = time.time()
    try:
        out = fn(*args)
        float(jnp.sum(out[:8, :8].astype(jnp.float32)))
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:2, :2].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{extra} (compile {comp:.0f}s)",
          flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    h, w = 384, 512
    chans = [384, 256, 256]
    x = jnp.asarray(rng.randn(h, w, chans[0]).astype(np.float32)
                    ).astype(jnp.bfloat16)
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        layers.append((k, None, b, True))
    fl = sum(h * w * 9 * 2 * ci * co
             for ci, co in zip(chans[:-1], chans[1:]))

    bench("dec2 baseline chain wc256",
          jax.jit(lambda x: conv_chain(x, layers, br=8, wc=256)), x,
          flops=fl)
    bench("dec2 chain mask=none",
          jax.jit(lambda x: conv_chain(x, layers, br=8, wc=256,
                                       mask_mode="none")), x, flops=fl)

    # single-layer chain vs conv9 (framework overhead at L=1)
    one = [layers[0]]
    fl1 = h * w * 9 * 2 * 384 * 256
    bench("dec2 L1 chain wc256",
          jax.jit(lambda x: conv_chain(x, one, br=8, wc=256)), x, flops=fl1)
    bench("dec2 L1 conv9 wc256",
          jax.jit(lambda x: conv9(x, one[0][0], None, one[0][2], relu=True,
                                  br=8, wc=256)), x, flops=fl1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
