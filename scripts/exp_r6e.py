"""Round-4e: stem kernel v3 — block-wide patch assembly.

stem v2 (ops/pallas_stem.stem_pool_conv, 8.8 ms of the 51.6 ms production
graph) rebuilds the full (336, Wc4) im2col patch buffer per OUTPUT row:
7 taps × (cast + 2 rolls + 3 writes) = 21 sublane-group writes per row,
168 per 8-row block. But consecutive output rows (stride 2) share 5 of 7
input rows. v3 assembles ONE (1008, Wc4) buffer per block — every input
row written once with its 3 column shifts (63 writes per block, 2.7×
less VPU work) — and each output row's patch becomes the CONTIGUOUS
slice big[96·y : 96·y+336] (row 48·ki+16·s layout makes consecutive
input rows 48 apart). The dot/accumulate/maxpool pipeline is unchanged,
so outputs are bit-identical.

Timing: stem-only in-graph (jit of pallas call + tiny consumer), then the
FULL fused-forward A/B if the standalone wins.

Usage: nohup python scripts/exp_r6e.py > /tmp/exp_r6e.log 2>&1 &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wsiseg_tpu.ops.pallas_stem import (_BR, fold_stem_weights2, pack_image2,
                                        stem2_geometry, stem_pool_conv)


def _stem3_kernel(img_hbm, w_ref, b_ref, cmask_ref, s2d_ref,
                  pool_ref, scratch, bigbuf, accbuf, shiftbuf, carry,
                  sem, *, w4: int):
    i = pl.program_id(0)
    rows = 2 * _BR + 5

    def dma(step, slot):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(step * 2 * _BR, rows)], scratch.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()
        carry[:] = jnp.zeros_like(carry)
        shiftbuf[0:1] = jnp.zeros((1, 64), jnp.float32)

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    sc = scratch.at[i % 2]

    w = w_ref[:].astype(jnp.bfloat16)            # (336, 128)
    bias = b_ref[:]                              # (1, 128)
    wc4 = bigbuf.shape[1]

    # block-wide assembly: each of the 21 input rows written ONCE with its
    # three column shifts; input row ri lands at bigbuf rows 48·ri+16·s
    for ri in range(rows):
        r = sc[ri].astype(jnp.int32)             # (16, Wc4)
        bigbuf[pl.ds(48 * ri, 16), :] = r.astype(jnp.bfloat16)
        for s_ in (1, 2):
            rolled = pltpu.roll(r, wc4 - s_, 1).astype(jnp.bfloat16)
            bigbuf[pl.ds(48 * ri + 16 * s_, 16), :] = rolled

    for y in range(_BR):
        # output row y's (336, Wc4) patch = contiguous big rows 96·y..+336
        acc = jax.lax.dot_general(
            bigbuf[pl.ds(96 * y, 336), 0:w4], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (w4, 128)
        v = jnp.maximum(acc + bias, 0.0)
        accbuf[y] = v
        s2d_ref[y // 2, :, 128 * (y % 2):128 * (y % 2) + 128] = \
            v.astype(jnp.bfloat16)

    cmask = cmask_ref[:]
    for p in range(_BR // 2):
        rm1 = carry[:] if p == 0 else accbuf[2 * p - 1]
        rmax = jnp.maximum(jnp.maximum(rm1, accbuf[2 * p]),
                           accbuf[2 * p + 1])
        e_ = rmax[:, 0:64]
        o_ = rmax[:, 64:128]
        shiftbuf[pl.ds(1, w4 - 1)] = o_[0:w4 - 1]
        om1 = shiftbuf[:]
        pool_ref[p] = jnp.maximum(jnp.maximum(om1, e_),
                                  o_ * cmask).astype(jnp.bfloat16)
    carry[:] = accbuf[_BR - 1]


@partial(jax.jit, static_argnames=("h_out", "w_out"))
def stem_pool_conv3(img12, w336, bias, h_out: int, w_out: int):
    hin, wc4, h_pad = stem2_geometry(h_out, w_out)
    assert img12.shape[0] >= hin and img12.shape[2] >= wc4
    w4 = w_out // 2
    n_blocks = h_pad // _BR
    cmask = jnp.ones((w4, 64), jnp.float32)
    half = h_pad // 2
    rows = 2 * _BR + 5
    kern = partial(_stem3_kernel, w4=w4)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BR // 2, w4, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR // 2, w4, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((half, w4, 256), jnp.bfloat16),
            jax.ShapeDtypeStruct((half, w4, 64), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 16, img12.shape[2]), jnp.uint8),
            pltpu.VMEM((48 * rows, img12.shape[2]), jnp.bfloat16),
            pltpu.VMEM((_BR, w4, 128), jnp.float32),
            pltpu.VMEM((w4, 64), jnp.float32),
            pltpu.VMEM((w4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img12, w336.astype(jnp.bfloat16), bias.astype(jnp.float32), cmask)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = default_config(compute_dtype="bfloat16", norm_dtype="bfloat16")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    ep = variables["params"]["encoder"]
    eb = variables["batch_stats"]["encoder"]

    H, W = 3072, 4096
    h_out, w_out = H // 2, W // 2
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 255, (H, W, 3), np.uint8)
    packed = jnp.asarray(pack_image2(img_u8, h_out, w_out))
    sync(packed)

    w336, bias2 = fold_stem_weights2(
        ep["stem_conv"]["kernel"], ep["stem_bn"]["scale"],
        ep["stem_bn"]["bias"], eb["stem_bn"]["mean"],
        eb["stem_bn"]["var"], cfg.dataset_mean, cfg.dataset_std)

    v2 = jax.jit(lambda p: stem_pool_conv(p, w336, bias2, h_out, w_out))
    v3 = jax.jit(lambda p: stem_pool_conv3(p, w336, bias2, h_out, w_out))

    c2, p2 = v2(packed)
    c3, p3 = v3(packed)
    dc = float(jnp.abs(c2.astype(jnp.float32) - c3.astype(jnp.float32)).max())
    dp = float(jnp.abs(p2.astype(jnp.float32) - p3.astype(jnp.float32)).max())
    print(f"equality: s2d max|d|={dc}  pool max|d|={dp}", flush=True)
    assert dc == 0.0 and dp == 0.0, "v3 must be bit-identical"

    bench("v2 (per-row assembly, production)", v2, packed)
    bench("v3 (block-wide assembly)", v3, packed)
    print("done", flush=True)


if __name__ == "__main__":
    main()
