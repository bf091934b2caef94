"""Tissue-mask extraction (`find_nuclei`) and foreground gating, on device.

Behavioral twin of reference utils/preprocessing.py:60-110: HSV saturation
threshold removes pink/white, LAB a-channel threshold removes white; optional
fill-holes + 10×10 close. Runs as one fused jit over the slide thumbnail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.color import rgb_to_hsv, rgb_to_lab
from wsiseg_tpu.ops.morphology import closing, fill_holes


def find_nuclei(rgb_uint8: jnp.ndarray, mu_percent: float = 0.1,
                mode: str = "hsv", fill_mask: bool = False) -> jnp.ndarray:
    """Tissue mask from an RGB thumbnail.

    Args:
      rgb_uint8: (H, W, 3) uint8 (or float in [0,255]).
      mu_percent: threshold knob; hsv mode: saturation > mu_percent
        (reference :96-98); lab mode: a > (1+mu_percent)*mean(a) (:88-92).
      fill_mask: apply fill-holes + 10×10 close (:100-106).

    Returns (H, W) uint8 mask in {0, 1}.
    """
    img = rgb_uint8.astype(jnp.float32) / 255.0
    if mode == "hsv":
        hsv = rgb_to_hsv(img)
        mask = hsv[..., 1] > mu_percent
    elif mode == "lab":
        lab = rgb_to_lab(img)
        a = lab[..., 1]
        mu = jnp.mean(a)
        mask = a > (1.0 + mu_percent) * mu
    else:
        raise ValueError(f"unknown mode {mode!r}")

    mask = mask.astype(jnp.uint8)
    if fill_mask:
        mask = fill_holes(mask)
        mask = closing(mask, 10)
    return mask.astype(jnp.uint8)


def isforeground(arr, thresh: float = 0.05) -> bool:
    """True if ≥ thresh fraction of pixels are nonzero
    (reference utils/preprocessing.py:60-71). Host-side helper."""
    arr = np.asarray(arr)
    if arr.size == 0:
        return False
    return np.count_nonzero(arr) / arr.size >= thresh


def foreground_fractions(mask: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                         dy: int, dx: int) -> jnp.ndarray:
    """Vectorized tile foreground fractions on device.

    For each tile origin (ys[i], xs[i]) in mask coordinates, returns the
    fraction of nonzero mask pixels in the (dy, dx) window — the batched
    equivalent of the per-tile `isforeground` gate in the reference grid
    enumeration (utils/dataset.py:147-166). Implemented with a summed-area
    table so cost is O(HW + N), independent of tile size.
    """
    m = (mask > 0).astype(jnp.float32)
    sat = jnp.pad(jnp.cumsum(jnp.cumsum(m, axis=0), axis=1), ((1, 0), (1, 0)))
    h, w = m.shape
    y0 = jnp.clip(ys, 0, h)
    x0 = jnp.clip(xs, 0, w)
    y1 = jnp.clip(ys + dy, 0, h)
    x1 = jnp.clip(xs + dx, 0, w)
    total = (sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0])
    return total / float(dy * dx)
