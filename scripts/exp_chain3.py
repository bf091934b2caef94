"""conv_chain with pad_inner (lane-native intermediates) across the fold
groups. Run after exp_chain2 (mask ablation).

Usage: nohup python scripts/exp_chain3.py > /tmp/exp_chain3.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.conv9 import conv_chain


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


def group(rng, name, h, w, chans, mask="full"):
    x = jnp.asarray(rng.randn(h, w, chans[0]).astype(np.float32)
                    ).astype(jnp.bfloat16)
    layers = []
    for ci, co in zip(chans[:-1], chans[1:]):
        k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        layers.append((k, None, b, True))
    fl = sum(h * w * 9 * 2 * ci * co
             for ci, co in zip(chans[:-1], chans[1:]))
    for br, wc in ((8, 512), (8, 1024), (16, 512)):
        if wc > w:
            continue
        bench(f"pad-chain br{br} wc{wc} {name} mask={mask}",
              jax.jit(lambda x, br=br, wc=wc: conv_chain(
                  x, layers, br=br, wc=wc, mask_mode=mask,
                  pad_inner=True)), x, flops=fl)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    group(rng, "b4 trio @1536x2048", 1536, 2048, [128, 64, 64, 16])
    group(rng, "dec3 pair @768x1024", 768, 1024, [320, 128, 128])
    group(rng, "dec2 pair @384x512", 384, 512, [384, 256, 256])
    group(rng, "enc l1 @768x1024", 768, 1024, [64, 64, 64])
    print("done", flush=True)


if __name__ == "__main__":
    main()
