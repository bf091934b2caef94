"""Pallas TPU kernel: 3×3 stride-1 conv for small output channels.

Motivation: XLA's conv lowering collapses for few-out-channel 3×3 convs at
large spatial extents when fused inside a larger graph (measured v5e:
64→16 at 1664×2176 runs ~43 ms inside the dense-inference graph vs ~20 ms
standalone). This kernel keeps a halo-padded spatial block VMEM-resident
and accumulates the nine tap matmuls (BLK·WBLK, Cin) @ (Cin, Cout) with no
HBM round-trips between taps.

Status: correct (exact vs lax.conv on chip and in interpreter mode) but
NOT currently wired into the engine — measured 27 ms at the head shape,
i.e. it beats the in-graph XLA pathology but not standalone XLA, and the
space-to-depth decoder tail (models/fast_decoder) addresses the same
bottleneck more effectively. Kept as the Pallas template for future
fused-stencil work (conv+BN+relu chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_kernel(x_ref, k_ref, b_ref, out_ref, *,
                 blk_h: int, blk_w: int, cin: int, cout: int):
    # x_ref: one halo-padded block (1, blk_h+2, blk_w+2, cin) in VMEM
    acc = jnp.zeros((blk_h * blk_w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + blk_h, dx:dx + blk_w, :]
            xs = xs.reshape(blk_h * blk_w, cin)
            acc = acc + jnp.dot(xs, k_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    out_ref[:] = acc.reshape(blk_h, blk_w, cout)


@functools.partial(jax.jit, static_argnames=("blk_h", "blk_w", "interpret"))
def conv3x3_small(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  blk_h: int = 64, blk_w: int = 512,
                  interpret: bool = False) -> jnp.ndarray:
    """SAME-padded 3×3 conv. x: (H, W, Cin); kernel: (3, 3, Cin, Cout).

    Returns (H, W, Cout) float32. Spatial dims are internally padded to
    block multiples; ``interpret=True`` runs the Pallas interpreter (CPU
    tests).
    """
    h, w, cin = x.shape
    cout = kernel.shape[-1]
    hp = -(-h // blk_h) * blk_h
    wp = -(-w // blk_w) * blk_w
    # channel dim is the lane dim: Mosaic DMA slices must be 128-aligned
    cpad = -(-cin // 128) * 128
    if cpad != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    # +2 halo (zeros = SAME zero padding)
    xpad = jnp.pad(x, ((1, 1 + hp - h), (1, 1 + wp - w), (0, cpad - cin)))
    cin = cpad

    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    b2 = bias.astype(jnp.float32).reshape(1, cout)

    # pre-split into overlapping halo blocks on the host-graph side so the
    # kernel's in_spec is a plain non-overlapping VMEM block (Mosaic DMA
    # lane-slicing restrictions make in-kernel halo DMA fragile)
    ny, nx = hp // blk_h, wp // blk_w
    blocks = jnp.stack([
        jax.lax.dynamic_slice(xpad, (i * blk_h, 0, 0),
                              (blk_h + 2, wp + 2, cin))
        for i in range(ny)])                       # (ny, blk_h+2, wp+2, C)
    blocks = jnp.stack([
        jax.lax.dynamic_slice(blocks, (0, 0, j * blk_w, 0),
                              (ny, blk_h + 2, blk_w + 2, cin))
        for j in range(nx)], axis=1)     # (ny, nx, blk_h+2, blk_w+2, C)
    blocks = blocks.reshape(ny * nx, blk_h + 2, blk_w + 2, cin)

    grid = (ny, nx)
    kern = functools.partial(_head_kernel, blk_h=blk_h, blk_w=blk_w,
                             cin=cin, cout=cout)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_h + 2, blk_w + 2, cin),
                         lambda i, j: (i * (wp // blk_w) + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # kernel (tiny)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
        ],
        out_specs=pl.BlockSpec((blk_h, blk_w, cout),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, cout), jnp.float32),
        interpret=interpret,
    )(blocks, kernel.astype(x.dtype), b2)
    return out[:h, :w]
