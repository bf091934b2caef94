"""Ablate the conv_chain slowdown (126 ms vs 27 ms singles on the b4 trio):
masking mode, block size, chain length.

Usage: nohup python scripts/exp_chain2.py > /tmp/exp_chain2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.conv9 import conv9, conv_chain


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:8, :8]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=10, flops=None):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:56s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    h, w = 1536, 2048
    chans = [128, 64, 64, 16]
    x = jnp.asarray(rng.randn(h, w, chans[0]).astype(np.float32)
                    ).astype(jnp.bfloat16)
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        layers.append((k, None, b, True))
    fl = sum(h * w * 9 * 2 * ci * co
             for ci, co in zip(chans[:-1], chans[1:]))

    for mm in ("none", "full", "bcast1"):
        bench(f"trio chain wc512 mask={mm}",
              jax.jit(lambda x, mm=mm: conv_chain(
                  x, layers, br=8, wc=512, mask_mode=mm)), x, flops=fl)
    bench("trio chain wc1024 mask=none",
          jax.jit(lambda x: conv_chain(x, layers, br=8, wc=1024,
                                       mask_mode="none")), x, flops=fl)
    bench("trio chain br16 wc512 mask=none",
          jax.jit(lambda x: conv_chain(x, layers, br=16, wc=512,
                                       mask_mode="none")), x, flops=fl)

    # chain-vs-single overhead at L=1 (identical math to conv9)
    one = [layers[0]]
    fl1 = h * w * 9 * 2 * 128 * 64
    bench("L1 chain wc512", jax.jit(lambda x: conv_chain(
        x, one, br=8, wc=512, mask_mode="none")), x, flops=fl1)
    bench("L1 conv9 wc512", jax.jit(lambda x: conv9(
        x, one[0][0], None, one[0][2], relu=True, br=8, wc=512)), x,
        flops=fl1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
