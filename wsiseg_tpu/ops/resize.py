"""Resize wrappers over jax.image, mirroring the PIL/cv2 call sites.

The reference resizes with PIL bilinear (utils/dataset.py:54-55), cv2
bilinear (utils/eval.py:70), and nearest for label masks. jax.image.resize
compiles to gathers/convs; 'linear' matches cv2.INTER_LINEAR semantics
(half-pixel centers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) or (H, W)."""
    if img.ndim == 2:
        shape = (out_h, out_w)
    else:
        shape = img.shape[:-3] + (out_h, out_w, img.shape[-1])
    orig_dtype = img.dtype
    out = jax.image.resize(img.astype(jnp.float32), shape, method="linear")
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(orig_dtype)


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize (labels/masks)."""
    if img.ndim == 2:
        shape = (out_h, out_w)
    else:
        shape = img.shape[:-3] + (out_h, out_w, img.shape[-1])
    return jax.image.resize(img, shape, method="nearest")
