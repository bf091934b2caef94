"""Binary morphology as windowed reductions — the TPU-native replacement for
OpenCV morphologyEx / scipy binary_fill_holes / mahotas bwperim
(reference utils/eval.py:91-95, utils/preprocessing.py:101-106,
utils/read_xml_sunnybrook.py:153-161).

Dilate/erode with an all-ones k×k structuring element are max/min pools —
single ``lax.reduce_window`` calls that XLA maps straight onto the VPU.
Hole filling is a bounded flood fill from the border expressed as a
``lax.while_loop`` over dilations (sequential by nature, but each step is a
full-image vector op).

Masks are float32/bool (H, W) or (..., H, W); all ops preserve shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _as_f32(mask: jnp.ndarray) -> jnp.ndarray:
    return (mask > 0).astype(jnp.float32) if mask.dtype != jnp.float32 else mask


def dilate(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Binary dilation with an all-ones (size, size) element (max-pool)."""
    m = _as_f32(mask)
    window = (1,) * (m.ndim - 2) + (size, size)
    out = lax.reduce_window(m, -jnp.inf, lax.max, window, (1,) * m.ndim, "SAME")
    return (out > 0).astype(mask.dtype)


def erode(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Binary erosion with an all-ones (size, size) element (min-pool)."""
    m = _as_f32(mask)
    window = (1,) * (m.ndim - 2) + (size, size)
    out = lax.reduce_window(m, jnp.inf, lax.min, window, (1,) * m.ndim, "SAME")
    return (out > 0).astype(mask.dtype)


def opening(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """cv2.MORPH_OPEN: erode then dilate (reference utils/eval.py:91)."""
    return dilate(erode(mask, size), size)


def closing(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """cv2.MORPH_CLOSE: dilate then erode (reference utils/preprocessing.py:106)."""
    return erode(dilate(mask, size), size)


def _dilate4(m: jnp.ndarray) -> jnp.ndarray:
    """One 4-connected binary dilation step via shifts (cheaper than 3x3 window
    when run inside a while_loop)."""
    up = jnp.pad(m[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(m[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(m[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(m[:, :-1], ((0, 0), (1, 0)))
    return m | up | down | left | right


def fill_holes(mask: jnp.ndarray, max_iters: int | None = None) -> jnp.ndarray:
    """Fill holes not connected to the border (scipy binary_fill_holes).

    Flood-fills background from the image border; anything background not
    reached is a hole. The while_loop runs until the reachable set stops
    growing (early-exits once nothing grows; the default cap H·W covers
    serpentine background corridors whose geodesic length exceeds H+W).
    """
    m = mask > 0
    h, w = m.shape[-2], m.shape[-1]
    if max_iters is None:
        max_iters = h * w

    bg = ~m
    seed = jnp.zeros_like(bg)
    seed = seed.at[0, :].set(bg[0, :])
    seed = seed.at[-1, :].set(bg[-1, :])
    seed = seed.at[:, 0].set(bg[:, 0])
    seed = seed.at[:, -1].set(bg[:, -1])

    def cond(state):
        i, cur, grew = state
        return (i < max_iters) & grew

    def body(state):
        i, cur, _ = state
        nxt = _dilate4(cur) & bg
        grew = jnp.any(nxt != cur)
        return i + 1, nxt, grew

    _, reach, _ = lax.while_loop(cond, body, (0, seed, jnp.array(True)))
    filled = m | (~reach & bg)
    return filled.astype(mask.dtype)


def bwperim(mask: jnp.ndarray) -> jnp.ndarray:
    """Perimeter pixels: foreground with at least one 4-neighbor background
    (mahotas.bwperim default connectivity; reference utils/eval.py:94,
    slic.py:63). Image-edge foreground pixels count as perimeter, matching
    mahotas' zero-padded border."""
    m = mask > 0
    up = jnp.pad(m[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(m[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(m[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(m[:, :-1], ((0, 0), (1, 0)))
    interior = up & down & left & right
    return (m & ~interior).astype(mask.dtype)
