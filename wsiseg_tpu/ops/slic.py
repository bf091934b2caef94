"""SLIC superpixels as a fused jnp routine.

Replaces skimage.segmentation.slic (reference slic.py:43 with n_segments=200,
compactness=20, sigma=5; preprocess/region_proposal_points_slic.py:65-68 with
n_segments=1000). Implemented as iterative localized k-means in CIELAB×XY
space — distance evaluation is one dense (N_pixels × K) computation per
iteration, which XLA tiles onto the MXU/VPU; spatial locality is enforced by
masking candidates beyond a 2S window (the classic SLIC search radius).

Cluster ids are not comparable to skimage's; downstream parity is asserted
on derived artifacts (SURVEY.md §7f).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops.color import rgb_to_lab


def _gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian over (H, W, C) — skimage slic pre-smoothing."""
    if sigma <= 0:
        return img
    radius = int(3 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(radius, radius), (0, 0), (0, 0)]
    out = jnp.pad(img, pad, mode="edge")
    out = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"),
                   in_axes=1, out_axes=1)(out.reshape(out.shape[0], -1))
    out = out.reshape(img.shape)
    out = jnp.swapaxes(out, 0, 1)
    pad_w = jnp.pad(out, pad, mode="edge")
    out = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"),
                   in_axes=1, out_axes=1)(pad_w.reshape(pad_w.shape[0], -1))
    out = out.reshape(jnp.swapaxes(img, 0, 1).shape)
    return jnp.swapaxes(out, 0, 1)


@partial(jax.jit, static_argnames=("n_segments", "iters"))
def _slic_core(lab_img: jnp.ndarray, n_segments: int, compactness: float,
               iters: int) -> jnp.ndarray:
    h, w = lab_img.shape[:2]
    n = h * w

    # grid-initialize K cluster centers
    s = max(1, int(np.sqrt(n / n_segments)))
    gy = np.arange(s // 2, h, s)
    gx = np.arange(s // 2, w, s)
    k = len(gy) * len(gx)
    cy0, cx0 = np.meshgrid(gy, gx, indexing="ij")
    cy0 = jnp.asarray(cy0.reshape(-1), jnp.float32)
    cx0 = jnp.asarray(cx0.reshape(-1), jnp.float32)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    feats = jnp.concatenate([lab_img, yy[..., None], xx[..., None]], -1)
    flat = feats.reshape(n, 5)

    ratio = (compactness / s) ** 2

    def centers_from(labels):
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = onehot.T @ flat
        return sums / jnp.maximum(counts, 1.0)[:, None]

    c_lab = jax.vmap(
        lambda y, x: lab_img[y.astype(jnp.int32), x.astype(jnp.int32)]
    )(cy0, cx0)
    centers = jnp.concatenate([c_lab, cy0[:, None], cx0[:, None]], -1)

    def step(_, centers):
        # color distance² + scaled spatial distance², with 2S locality mask
        d_color = (jnp.sum(flat[:, :3] ** 2, -1)[:, None]
                   - 2.0 * flat[:, :3] @ centers[:, :3].T
                   + jnp.sum(centers[:, :3] ** 2, -1)[None, :])
        d_space = (jnp.sum(flat[:, 3:] ** 2, -1)[:, None]
                   - 2.0 * flat[:, 3:] @ centers[:, 3:].T
                   + jnp.sum(centers[:, 3:] ** 2, -1)[None, :])
        d = d_color + ratio * d_space
        d = jnp.where(d_space > (2.0 * s) ** 2, jnp.inf, d)
        labels = jnp.argmin(d, axis=1)
        return centers_from(labels)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d_color = (jnp.sum(flat[:, :3] ** 2, -1)[:, None]
               - 2.0 * flat[:, :3] @ centers[:, :3].T
               + jnp.sum(centers[:, :3] ** 2, -1)[None, :])
    d_space = (jnp.sum(flat[:, 3:] ** 2, -1)[:, None]
               - 2.0 * flat[:, 3:] @ centers[:, 3:].T
               + jnp.sum(centers[:, 3:] ** 2, -1)[None, :])
    d = d_color + ratio * d_space
    d = jnp.where(d_space > (2.0 * s) ** 2, jnp.inf, d)
    # fall back to unmasked distance for pixels farther than 2S from every
    # center (possible at image corners)
    labels = jnp.where(jnp.all(jnp.isinf(d), axis=1),
                       jnp.argmin(d_color + ratio * d_space, axis=1),
                       jnp.argmin(d, axis=1))
    return labels.reshape(h, w).astype(jnp.int32)


def slic(rgb_uint8, n_segments: int = 200, compactness: float = 20.0,
         sigma: float = 5.0, iters: int = 10) -> jnp.ndarray:
    """SLIC labels (H, W) int32 in [0, K)."""
    img = jnp.asarray(rgb_uint8).astype(jnp.float32) / 255.0
    lab = rgb_to_lab(img)
    lab = _gaussian_blur(lab, sigma)
    return _slic_core(lab, n_segments, compactness, iters)


def mark_boundaries(rgb_uint8: np.ndarray, labels: np.ndarray,
                    color=(255, 255, 0)) -> np.ndarray:
    """Overlay superpixel boundaries (skimage.mark_boundaries twin)."""
    labels = np.asarray(labels)
    edge = np.zeros(labels.shape, bool)
    edge[:-1, :] |= labels[:-1, :] != labels[1:, :]
    edge[:, :-1] |= labels[:, :-1] != labels[:, 1:]
    out = np.asarray(rgb_uint8).copy()
    out[edge] = color
    return out
