"""On-device overlap-add stitching of tile logits into a slide canvas.

This replaces the reference's host-side hot loop — per-tile D2H copy plus
numpy ``pred[:, y:y+dy, x:x+dx] += pred_src[bj]`` (utils/eval.py:208-215) —
with device-resident accumulation: the logit canvas lives in HBM for the
whole slide, tiles are gathered from the device-resident level image, and
partial sums never touch the host.

Core ops:
  * :func:`gather_tiles`   — (B,) dynamic-slice gather of tile windows.
  * :func:`scatter_add_tiles` — sequential fori_loop of dynamic read-add-
    write. Sequential is REQUIRED for correctness: at stride 128 / tile 512,
    16 tiles overlap every pixel, so parallel scatters would race; XLA's
    scatter-add lowering for full windows is far slower than this loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gather_tiles(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                 th: int, tw: int) -> jnp.ndarray:
    """Gather (B, th, tw, C) windows from (H, W, C) at per-tile origins."""

    def one(y, x):
        return lax.dynamic_slice(image, (y, x, 0), (th, tw, image.shape[2]))

    return jax.vmap(one)(ys, xs)


def scatter_add_tiles(canvas: jnp.ndarray, tiles: jnp.ndarray,
                      ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """canvas[y:y+th, x:x+tw, :] += tiles[b] for every b, sequentially."""
    th, tw = tiles.shape[1], tiles.shape[2]

    def body(b, cv):
        y, x = ys[b], xs[b]
        window = lax.dynamic_slice(cv, (y, x, 0), (th, tw, cv.shape[2]))
        return lax.dynamic_update_slice(cv, window + tiles[b], (y, x, 0))

    return lax.fori_loop(0, tiles.shape[0], body, canvas)


def scatter_add_scalar_tiles(canvas: jnp.ndarray, values: jnp.ndarray,
                             ys: jnp.ndarray, xs: jnp.ndarray,
                             th: int, tw: int) -> jnp.ndarray:
    """Broadcast-add per-tile class vectors (B, C) over (th, tw) windows —
    the reference's classifier-mode painting (utils/eval.py:210-215, where a
    (C,) prediction broadcasts across the tile window)."""

    def body(b, cv):
        y, x = ys[b], xs[b]
        window = lax.dynamic_slice(cv, (y, x, 0), (th, tw, cv.shape[2]))
        return lax.dynamic_update_slice(
            cv, window + values[b][None, None, :], (y, x, 0))

    return lax.fori_loop(0, values.shape[0], body, canvas)


def overlap_count(shape_hw: tuple[int, int], ys, xs, th: int, tw: int) -> jnp.ndarray:
    """(H, W) count of how many tiles covered each pixel — for normalizing an
    overlap-add canvas into a mean when needed."""
    canvas = jnp.zeros(shape_hw + (1,), jnp.float32)
    ones = jnp.ones((ys.shape[0], th, tw, 1), jnp.float32)
    return scatter_add_tiles(canvas, ones, ys, xs)[..., 0]
