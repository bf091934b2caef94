"""Round-3j: does int8 pay on this chip's conv/matmul path?

v5e datasheet: int8 ~2x bf16 TOPS. Probes (in-graph, 5 iters):
  A. (8192, 2048) x (2048, 2048) matmul bf16 vs int8->int32
  B. 3x3 conv 256->256 @ (768, 1024) bf16 vs int8
  C. 3x3 conv 128->128 @ (768, 1024) (decoder-b3-like) bf16 vs int8

Usage: nohup python scripts/exp_r3j.py > /tmp/exp_r3j.log 2>&1 &
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


def bench(name, fn, *args, iters=5, flops=None):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)

    M, K, N = 8192, 2048, 2048
    a_bf = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b_bf = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)
    fl = 2 * M * K * N

    @jax.jit
    def mm_bf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    bench("A matmul bf16", mm_bf, a_bf, b_bf, flops=fl)
    bench("A matmul int8->int32", mm_i8, a_i8, b_i8, flops=fl)

    H, W = 768, 1024
    for C in (256, 128):
        x_bf = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
        k_bf = jnp.asarray(rng.randn(3, 3, C, C), jnp.bfloat16)
        x_i8 = jnp.asarray(rng.randint(-127, 127, (1, H, W, C)), jnp.int8)
        k_i8 = jnp.asarray(rng.randint(-127, 127, (3, 3, C, C)), jnp.int8)
        flc = 2 * 9 * C * C * H * W

        @jax.jit
        def cv_bf(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        @jax.jit
        def cv_i8(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        bench(f"B conv 3x3 {C}->{C} bf16", cv_bf, x_bf, k_bf, flops=flc)
        try:
            bench(f"B conv 3x3 {C}->{C} int8->int32", cv_i8, x_i8, k_i8,
                  flops=flc)
        except Exception as e:
            print(f"  int8 conv {C} failed: {e!r}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
