"""TRAIN-mode encoder layer1 in s2d(2): A/B the fwd+grad cost.

Inference broke even (exp_r3l: full fwd 54.8->60.9 ms, layer1 stays
native) — the 16/9 tap redundancy ate the 64->256 lane gain.  Training
runs THREE conv passes (fwd, dgrad, wgrad) per conv, so the lane gain
triples while the relayout cost stays fixed; this probe measures whether
that flips the sign at train shapes (b32 @512^2 -> layer1 input
(32,128,128,64)).

Variants (each: layer1 = 2 basic blocks + layer2 entry conv s2 64->128,
train-mode BN, loss = mean(out^2), grad wrt all params + input):
  native      — canonical NHWC layout
  s2d-free    — input ALREADY s2d(2) (a stem that emits s2d makes this
                free, cf. inference maxpool_s2d) and layer2 entry
                consumes s2d via s2d_stride2_kernel: zero relayouts
  s2d-relay   — same but space_to_depth(x) inside the timed graph
                (upper bound on the integration cost)

Usage: nohup python scripts/exp_r5f.py > /tmp/exp_r5f.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from jax import lax


def conv(x, w, stride=1):
    # explicit pad=1 (the torch convention; XLA SAME at stride 2 pads
    # (0, 1) and samples a shifted grid)
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_train(x, g, b, *, groups=1):
    """Train-mode BN; with groups>1 the lane dim is (groups, C) and the
    stats pool over the group axis (== canonical BN of the d2s tensor)."""
    c = x.shape[-1] // groups
    xg = x.reshape(x.shape[:-1] + (groups, c))
    xg = xg.astype(jnp.promote_types(x.dtype, jnp.float32))
    mu = jnp.mean(xg, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(xg), axis=(0, 1, 2, 3)) - jnp.square(mu)
    y = (xg - mu) * lax.rsqrt(var + 1e-5) * g + b
    return y.reshape(x.shape).astype(x.dtype)


def make_params(rng, dtype):
    ks = jax.random.split(rng, 8)
    p = {}
    for i in range(4):  # layer1: 2 blocks x 2 convs, 64->64
        p[f"w{i}"] = (jax.random.normal(ks[i], (3, 3, 64, 64), dtype)
                      * 0.05)
        p[f"g{i}"] = jnp.ones((64,), jnp.float32)
        p[f"b{i}"] = jnp.zeros((64,), jnp.float32)
    p["w4"] = jax.random.normal(ks[4], (3, 3, 64, 128), dtype) * 0.05
    p["g4"] = jnp.ones((128,), jnp.float32)
    p["b4"] = jnp.zeros((128,), jnp.float32)
    return p


def fwd_native(p, x):
    for blk in range(2):
        i = 2 * blk
        h = jax.nn.relu(bn_train(conv(x, p[f"w{i}"]), p[f"g{i}"],
                                 p[f"b{i}"]))
        h = bn_train(conv(h, p[f"w{i+1}"]), p[f"g{i+1}"], p[f"b{i+1}"])
        x = jax.nn.relu(x + h)
    y = conv(x, p["w4"], stride=2)
    return jax.nn.relu(bn_train(y, p["g4"], p["b4"]))


def fwd_s2d(p, xs):
    from wsiseg_tpu.models.fast_decoder import (s2d_kernel,
                                                s2d_stride2_kernel)
    for blk in range(2):
        i = 2 * blk
        h = jax.nn.relu(bn_train(conv(xs, s2d_kernel(p[f"w{i}"])),
                                 p[f"g{i}"], p[f"b{i}"], groups=4))
        h = bn_train(conv(h, s2d_kernel(p[f"w{i+1}"])),
                     p[f"g{i+1}"], p[f"b{i+1}"], groups=4)
        xs = jax.nn.relu(xs + h)
    # layer2 entry consumes s2d directly: 2x2 stride-1 conv, pad (1,0)
    k2 = s2d_stride2_kernel(p["w4"])
    y = lax.conv_general_dilated(
        xs, k2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(bn_train(y, p["g4"], p["b4"]))


def main():
    from wsiseg_tpu.models.fast_decoder import space_to_depth

    print("platform:", jax.devices()[0].platform, flush=True)
    dtype = jnp.bfloat16
    b = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 128, 128, 64), dtype)
    xs = space_to_depth(x, 2)
    p = make_params(jax.random.PRNGKey(1), dtype)

    # numeric check first (f32, small): s2d == native
    xf = x[:2].astype(jnp.float32)
    pf = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), p)
    yn = fwd_native(pf, xf)
    ys = fwd_s2d(pf, space_to_depth(xf, 2))
    err = float(jnp.max(jnp.abs(yn - ys)))
    print(f"fwd parity max|d| = {err:.2e}", flush=True)
    # f64 proves the math exact (fwd 7e-15, grads 3e-17 — run the f64
    # block in the commit message's CPU snippet); f32 shows the usual
    # BN-rsqrt conditioning envelope (~1e-2 through 5 BNs)
    assert err < 5e-2, err

    def timed(name, loss_fn, *args):
        g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        r = g(*args)
        r = g(*args)
        jax.block_until_ready(r)
        float(jnp.sum(r[0]["w0"].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(20):
            r = g(*args)
        float(jnp.sum(r[0]["w0"].astype(jnp.float32)))
        dt = (time.time() - t0) / 20
        print(f"{name:12s}: {dt * 1e3:7.2f} ms/grad", flush=True)
        return dt

    def loss_native(p, x):
        return jnp.mean(jnp.square(fwd_native(p, x).astype(jnp.float32)))

    def loss_s2d_free(p, xs):
        return jnp.mean(jnp.square(fwd_s2d(p, xs).astype(jnp.float32)))

    def loss_s2d_relay(p, x):
        return jnp.mean(jnp.square(
            fwd_s2d(p, space_to_depth(x, 2)).astype(jnp.float32)))

    timed("native", loss_native, p, x)
    timed("s2d-free", loss_s2d_free, p, xs)
    timed("s2d-relay", loss_s2d_relay, p, x)
    print("done", flush=True)


if __name__ == "__main__":
    main()
