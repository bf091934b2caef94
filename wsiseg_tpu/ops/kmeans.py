"""Lloyd k-means in jnp — TPU replacement for sklearn (MiniBatch)KMeans.

The reference uses KMeans for region keypoints (utils/regiontools.py:89),
color quantization (utils/preprocessing.py:365), and tile-center selection
(preprocess/mk_traindata_*:138-149). Cluster IDs are not reproducible across
implementations; parity is asserted on downstream artifacts (SURVEY.md §7f).

Fixed iteration count, deterministic k-means++ seeding from a JAX PRNG key;
distance matrix is one (N, K) matmul per step — MXU-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _plusplus_init(key: jax.Array, points: jnp.ndarray, k: int,
                   weights: jnp.ndarray) -> jnp.ndarray:
    """k-means++ seeding (greedy weighted D² sampling). Zero-weight
    (padding) points can never be chosen as seeds."""
    n = points.shape[0]
    k0, key = jax.random.split(key)
    first_idx = jax.random.choice(
        k0, n, p=weights / jnp.maximum(jnp.sum(weights), 1e-12))
    centers = jnp.zeros((k, points.shape[1]),
                        points.dtype).at[0].set(points[first_idx])

    def body(i, state):
        centers, key = state
        d2 = jnp.min(
            jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, -1)
            + jnp.where(jnp.arange(k)[None, :] >= i, jnp.inf, 0.0), axis=1)
        d2 = d2 * weights
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(points[idx]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(key: jax.Array, points: jnp.ndarray, k: int,
           iters: int = 25,
           weights: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Lloyd iterations.

    Args:
      points: (N, D) float. Pad-and-mask via ``weights`` (0 weight = ignore)
        to keep shapes static under jit.
    Returns (centers (K, D), labels (N,) int32).
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else weights.astype(jnp.float32)

    centers = _plusplus_init(key, points, k, w)

    def step(_, centers):
        # ||p - c||² = ||p||² - 2 p·c + ||c||²; argmin over c drops ||p||².
        d = (-2.0 * points @ centers.T
             + jnp.sum(centers ** 2, -1)[None, :])
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32) * w[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ points
        new = sums / jnp.maximum(counts, 1e-12)[:, None]
        # keep empty clusters where they were
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d = -2.0 * points @ centers.T + jnp.sum(centers ** 2, -1)[None, :]
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    labels = jnp.where(w > 0, labels, -1)
    return centers, labels


def quantize_image(key: jax.Array, rgb_uint8: jnp.ndarray,
                   n_colors: int = 0, iters: int = 10) -> jnp.ndarray:
    """K-means color quantization (reference utils/preprocessing.py:358-370).
    n_colors < 2 returns the input unchanged."""
    if n_colors < 2:
        return rgb_uint8
    h, w, _ = rgb_uint8.shape
    flat = rgb_uint8.reshape(-1, 3).astype(jnp.float32)
    centers, labels = kmeans(key, flat, n_colors, iters=iters)
    q = jnp.clip(jnp.round(centers[labels]), 0, 255).astype(jnp.uint8)
    return q.reshape(h, w, 3)


def mask_keypoints(key: jax.Array, mask: jnp.ndarray, us: int,
                   min_clusters: int, max_points: int = 4096):
    """K-means centers of a binary region — `get_key_points` twin
    (reference utils/regiontools.py:68-102).

    Downsamples the mask by ``us``, clusters foreground pixel coordinates,
    and returns centers scaled back up. Host/JAX hybrid: coordinate
    extraction is data-dependent, so it runs in numpy; clustering runs
    on device with padded static shapes.

    Returns (num_clusters, centers_xy int (K, 2)) or (None, None) when the
    region is too small (reference :86-87).
    """
    import numpy as np
    m = np.asarray(mask)
    m = m[::us, ::us]
    ys, xs = np.nonzero(m)
    coords = np.stack([xs, ys], axis=1).astype(np.float32)  # (x, y) pairs
    k = int(min_clusters)
    if k <= 1 or coords.shape[0] <= 3 * k:
        return None, None
    if coords.shape[0] > max_points:
        sel = np.random.RandomState(0).choice(coords.shape[0], max_points, replace=False)
        coords = coords[sel]
    pad = (-len(coords)) % 8
    if pad:
        wts = np.concatenate([np.ones(len(coords)), np.zeros(pad)]).astype(np.float32)
        coords = np.concatenate([coords, np.zeros((pad, 2), np.float32)])
    else:
        wts = np.ones(len(coords), np.float32)
    centers, _ = kmeans(key, jnp.asarray(coords), k, weights=jnp.asarray(wts))
    centers = (us * np.asarray(centers)).astype(np.int64)
    return k, centers
