"""Color-space conversions and photometric augmentation, in jnp.

Replaces skimage.color.rgb2hsv/rgb2lab (reference utils/preprocessing.py:89,96)
and torchvision ColorJitter (utils/preprocessing.py:206-218) with fused,
jittable element-wise math that XLA folds into adjacent ops on the VPU.

All functions take float32 RGB in [0, 1] with channels last.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB→HSV with H, S, V all in [0, 1] (skimage convention)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)

    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta

    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)

    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# sRGB → XYZ (D65) matrix, rows = X, Y, Z.
_RGB2XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=jnp.float32)
# D65 reference white = matrix row sums, so pure white maps to exactly
# L=100, a=b=0 regardless of matrix rounding.
_XYZ_REF = jnp.sum(_RGB2XYZ, axis=1)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB→CIELAB (D65), matching skimage.color.rgb2lab."""
    # inverse sRGB companding
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    # Explicit per-channel combination (VPU, full f32) rather than a matmul:
    # on TPU the default matmul precision is bf16, which is visible at the
    # ±0.05 Lab tolerance this op is tested to.
    r, g, b_ = lin[..., 0], lin[..., 1], lin[..., 2]
    xyz = jnp.stack([
        _RGB2XYZ[0, 0] * r + _RGB2XYZ[0, 1] * g + _RGB2XYZ[0, 2] * b_,
        _RGB2XYZ[1, 0] * r + _RGB2XYZ[1, 1] * g + _RGB2XYZ[1, 2] * b_,
        _RGB2XYZ[2, 0] * r + _RGB2XYZ[2, 1] * g + _RGB2XYZ[2, 2] * b_,
    ], axis=-1)
    xyz = xyz / _XYZ_REF

    eps = 0.008856  # (6/29)^3
    kappa = 903.3   # (29/3)^3
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), (kappa * xyz + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def normalize(img: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    """(img - mean) / std per channel — torchvision Normalize semantics
    (reference utils/preprocessing.py:211,217)."""
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return (img - mean) / std


def denormalize(img: jnp.ndarray, mean: Sequence[float],
                std: Sequence[float]) -> jnp.ndarray:
    """Inverse of :func:`normalize` (reference NormalizeInverse,
    utils/preprocessing.py:35-47)."""
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return img * std + mean


def color_jitter(rgb: jnp.ndarray, key: jax.Array,
                 brightness: float = 0.25, contrast: float = 0.75,
                 saturation: float = 0.25, hue: float = 0.04) -> jnp.ndarray:
    """Random photometric jitter, one draw per call.

    Matches torchvision ColorJitter factor ranges (multiplicative factors
    uniform in [max(0, 1-x), 1+x]; hue additive in [-hue, hue]) used by the
    reference augmentor (utils/preprocessing.py:215). Application order is
    fixed (brightness, contrast, saturation, hue) rather than shuffled —
    a deliberate simplification for jit-friendliness.
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    out = jnp.clip(rgb * fb, 0.0, 1.0)
    # torchvision contrast pivots on the mean of the grayscale image
    gray = (0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])
    mean = jnp.mean(gray)
    out = jnp.clip((out - mean) * fc + mean, 0.0, 1.0)

    hsv = rgb_to_hsv(out)
    s = jnp.clip(hsv[..., 1] * fs, 0.0, 1.0)
    h = (hsv[..., 0] + fh) % 1.0
    out = hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    return jnp.clip(out, 0.0, 1.0)


def batch_color_jitter(rgb: jnp.ndarray, key: jax.Array, **kw) -> jnp.ndarray:
    """Independent jitter per batch element; vmapped over the batch axis."""
    keys = jax.random.split(key, rgb.shape[0])
    return jax.vmap(lambda im, k: color_jitter(im, k, **kw))(rgb, keys)
