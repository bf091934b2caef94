"""Round-3d: chip-ceiling probes + layer1 variants.

1. HBM bandwidth probe (elementwise add on 512 MB) and transpose rate.
2. MXU peak probe (8192^3 bf16 matmul).
   These calibrate what MFU is ACHIEVABLE through the axon relay chip —
   if the real matmul ceiling is far below 197 TFLOP/s, the bench MFU
   denominator overstates headroom.
3. Encoder layer1 variants: native vs width-packed (k=2 spatial pieces on
   channels with halo columns, 2x tap redundancy vs s2d's 4x).

Usage: nohup python scripts/exp_r3d.py > /tmp/exp_r3d.log 2>&1 &
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


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5, bytes_=None, flops=None):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = ""
    if bytes_:
        extra += f"  {bytes_ / dt / 1e9:8.1f} GB/s"
    if flops:
        extra += f"  {flops / dt / 1e12:8.2f} TFLOP/s"
    print(f"{name:52s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def conv(x, k, stride=1, padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    r = np.random.RandomState(0)

    # ---- HBM bandwidth ----
    big = jnp.asarray(r.rand(256, 1024, 1024).astype(np.float32)
                      ).astype(jnp.bfloat16)          # 512 MB bf16
    sync(big)
    bench("BW: x+1 on 512MB bf16 (r+w=1GB)",
          jax.jit(lambda a: a + 1.0), big, bytes_=2 * big.nbytes)
    bench("BW: transpose last two dims 512MB",
          jax.jit(lambda a: jnp.transpose(a, (0, 2, 1))), big,
          bytes_=2 * big.nbytes)

    # ---- MXU peak ----
    n = 8192
    A = jnp.asarray(r.rand(n, n).astype(np.float32)).astype(jnp.bfloat16)
    B = jnp.asarray(r.rand(n, n).astype(np.float32)).astype(jnp.bfloat16)
    sync(A)
    bench("MXU: 8192^3 bf16 matmul (f32 accum)",
          jax.jit(lambda a, b: jnp.dot(a, b,
                                       preferred_element_type=jnp.float32)
                  .astype(jnp.bfloat16)),
          A, B, flops=2 * n ** 3)
    # conv-shaped peak: 512-ch 3x3 at modest dims (the encoder's deep shape)
    xc = jnp.asarray(r.rand(1, 96, 128, 512).astype(np.float32)
                     ).astype(jnp.bfloat16)
    wc = jnp.asarray(r.rand(3, 3, 512, 512).astype(np.float32) * 0.05
                     ).astype(jnp.bfloat16)
    sync(xc)
    bench("conv peak: 3x3 512->512 @96x128",
          jax.jit(lambda a: conv(a, wc).astype(jnp.bfloat16)), xc,
          flops=2 * 9 * 512 * 512 * 96 * 128)

    # ---- layer1 variants ----
    H4, W4, C = 768, 1024, 64
    x4 = jnp.asarray(r.rand(1, H4, W4, C).astype(np.float32) * 0.1
                     ).astype(jnp.bfloat16)
    ws = [jnp.asarray(r.rand(3, 3, C, C).astype(np.float32) * 0.05
                      ).astype(jnp.bfloat16) for _ in range(4)]
    sync(x4)
    fl = 4 * 2 * 9 * C * C * H4 * W4

    @jax.jit
    def l1_native(x):
        for j in (0, 1):
            idn = x
            y = jax.nn.relu(conv(x, ws[2 * j]).astype(jnp.bfloat16))
            y = conv(y, ws[2 * j + 1])
            x = jax.nn.relu(y + idn.astype(jnp.float32)).astype(jnp.bfloat16)
        return x

    bench("L1 native (64ch @768x1024)", l1_native, x4, flops=fl)

    # width-packed k=2: split W into halves stacked on channels, 1-col
    # halo each side, block-diagonal kernels (2x tap redundancy)
    def wpack2(x):                        # (1, H, W, C) -> (1, H, W/2+2, 2C)
        b, h, w, c = x.shape
        left = jnp.pad(x[:, :, : w // 2 + 1], ((0, 0), (0, 0), (1, 0),
                                               (0, 0)))
        right = jnp.pad(x[:, :, w // 2 - 1:], ((0, 0), (0, 0), (0, 1),
                                               (0, 0)))
        return jnp.concatenate([left, right], axis=-1)

    def wunpack2(x):                      # inverse (drop halo cols)
        b, h, wp, c2 = x.shape
        c = c2 // 2
        return jnp.concatenate([x[:, :, 1:-1, :c], x[:, :, 1:-1, c:]],
                               axis=2)

    def bd(w):                            # block-diagonal (3,3,2C,2C)
        z = jnp.zeros_like(w)
        top = jnp.concatenate([w, z], axis=3)
        bot = jnp.concatenate([z, w], axis=3)
        return jnp.concatenate([top, bot], axis=2)

    wbd = [bd(w) for w in ws]

    @jax.jit
    def l1_wpack(x):
        xp = wpack2(x)                    # (1, H, W/2+2, 128)
        for j in (0, 1):
            idn = xp
            y = jax.nn.relu(conv(xp, wbd[2 * j]).astype(jnp.bfloat16))
            y = conv(y, wbd[2 * j + 1])
            xp = jax.nn.relu(y + idn.astype(jnp.float32)
                             ).astype(jnp.bfloat16)
            # re-zero the halo columns so piece cross-talk stays exact
            mask = jnp.ones((1, 1, xp.shape[2], 1), xp.dtype)
            mask = mask.at[:, :, 0].set(0).at[:, :, -1].set(0)
            xp = xp * mask
        return wunpack2(xp)

    bench("L1 wpack2 (128ch @768x514)", l1_wpack, x4, flops=fl)

    # correctness spot-check of wpack (single conv, small)
    xs = jnp.asarray(r.rand(1, 8, 12, 3).astype(np.float32))
    wsm = jnp.asarray(r.rand(3, 3, 3, 3).astype(np.float32))
    ref = conv(xs, wsm)

    def bd_f32(w):
        z = jnp.zeros_like(w)
        return jnp.concatenate([jnp.concatenate([w, z], 3),
                                jnp.concatenate([z, w], 3)], 2)

    xp = wpack2(xs)
    got = wunpack2(conv(xp, bd_f32(wsm)))
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"wpack2 single-conv maxerr={err:.2e}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
