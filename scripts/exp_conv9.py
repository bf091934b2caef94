"""Measure conv9 (Pallas 9-tap conv) vs XLA conv across decoder-tail shapes.

Usage: nohup python scripts/exp_conv9.py > /tmp/exp_conv9.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.conv9 import conv9


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:8, :8].astype(jnp.float32)))


def bench(name, fn, *args, iters=10, flops=None):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def xla_conv(x, k, s, b):
    y = jax.lax.conv_general_dilated(
        x[None], k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0]
    return jax.nn.relu(y * s + b).astype(jnp.bfloat16)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    shapes = [
        # (name, H, W, Cin, Cout)
        ("b4conv1 s2d", 1536, 2048, 128, 64),
        ("b4conv2 s2d", 1536, 2048, 64, 64),
        ("head s2d", 1536, 2048, 64, 16),
        ("b3conv1 s2dfold", 768, 1024, 320, 128),
        ("b3conv2 s2d", 768, 1024, 128, 128),
        ("b2conv1 s2dfold", 384, 512, 384, 256),
        ("b2conv2 native", 768, 1024, 64, 64),
        ("b1conv1 native", 384, 512, 384, 128),
        ("b0conv1 native", 192, 256, 768, 256),
        ("enc l1 conv", 768, 1024, 64, 64),
    ]

    for (name, h, w, cin, cout) in shapes:
        x = jnp.asarray(rng.randn(h, w, cin).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.05
                         ).astype(np.float32))
        s = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        fl = h * w * 9 * 2 * cin * cout

        fx = jax.jit(lambda x, k=k, s=s, b=b: xla_conv(x, k, s, b))
        bench(f"XLA   {name} {cin}->{cout} @{h}x{w}", fx, x, flops=fl)

        cpad = cin + (-cin) % 128
        for br, wc in ((8, 1024), (8, 512), (8, 256)):
            if wc > w:
                continue
            # scratch + one dx-sliced copy + f32 accumulator
            vm = (2 * (br + 2) * (wc + 16) * cpad * 2
                  + br * wc * max(cout, 128) * 4)
            if vm > 13e6:
                continue
            fp = jax.jit(lambda x, k=k, s=s, b=b, br=br, wc=wc: conv9(
                x, k, s, b, relu=True, br=br, wc=wc))
            bench(f"conv9 {name} {cin}->{cout} br{br} wc{wc}",
                  fp, x, flops=fl)

    print("done", flush=True)


if __name__ == "__main__":
    main()
