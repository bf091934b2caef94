"""Measure conv_chain (fused multi-conv Pallas kernel) on the decoder-tail
stage groups vs the best measured alternatives (XLA / conv9 singles).

Usage: nohup python scripts/exp_chain.py > /tmp/exp_chain.log 2>&1 &
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


def mk_layers(rng, chans, relu_last=False):
    layers = []
    for idx, (ci, co) in enumerate(zip(chans[:-1], chans[1:])):
        k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
        s = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(co).astype(np.float32))
        relu = True if idx + 2 < len(chans) else relu_last
        layers.append((k, s, b, relu))
    return layers


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    groups = [
        # (name, H, W, channel chain)  [decoder-tail stage groups, s2d dims]
        ("b4 trio 128->64->64->16 @1536x2048", 1536, 2048, [128, 64, 64, 16]),
        ("dec3 pair 320->128->128 @768x1024", 768, 1024, [320, 128, 128]),
        ("dec2 pair 384->256->256 @384x512", 384, 512, [384, 256, 256]),
        ("enc l1 block 64->64->64 @768x1024", 768, 1024, [64, 64, 64]),
        ("enc l1 s2d block 256->256->256 @384x512", 384, 512,
         [256, 256, 256]),
    ]

    for (name, h, w, chans) in groups:
        x = jnp.asarray(rng.randn(h, w, chans[0]).astype(np.float32)
                        ).astype(jnp.bfloat16)
        layers = mk_layers(rng, chans)
        fl = sum(h * w * 9 * 2 * ci * co
                 for ci, co in zip(chans[:-1], chans[1:]))

        # baseline: conv9 singles
        def singles(x, layers=tuple(layers)):
            y = x
            for (k, s, b, relu) in layers:
                y = conv9(y, k, s, b, relu=relu, br=8, wc=256)
            return y
        bench(f"conv9-singles {name}", jax.jit(singles), x, flops=fl)

        for br, wc in ((8, 256), (8, 512), (8, 1024),
                       (16, 512), (16, 1024), (32, 512)):
            if wc > w:
                continue
            L = len(layers)
            cpad = chans[0] + (-chans[0]) % 128
            vm = 2 * (br + 2 * L) * (wc + 2 * L + 16) * cpad * 2 \
                + 2 * br * wc * max(chans[-1], 128) * 2
            if vm > 40e6:
                continue
            fc = jax.jit(lambda x, layers=tuple(layers), br=br, wc=wc:
                         conv_chain(x, layers, br=br, wc=wc))
            bench(f"chain br{br} wc{wc} {name}", fc, x, flops=fl)

    # XLA relayout costs the fold decode pays between kernels
    from wsiseg_tpu.models.fast_decoder import (depth_to_space,
                                                space_to_depth)
    c1 = jnp.asarray(rng.randn(1, 1664, 2176, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bench("s2d c1 (1664x2176x64)", jax.jit(lambda a: space_to_depth(a)), c1)
    x3 = jnp.asarray(rng.randn(1, 832, 1088, 128).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bench("d2s x3 (832x1088x128)", jax.jit(lambda a: depth_to_space(a)), x3)
    a = jnp.asarray(rng.randn(832, 1088, 64).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(832, 1088, 256).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bench("concat 64+256 (832x1088)",
          jax.jit(lambda a, b: jnp.concatenate([a, b], -1)), a, b2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
