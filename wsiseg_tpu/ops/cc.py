"""Connected components.

The reference uses ``cv2.connectedComponentsWithStats`` on level-2
thumbnails (scannet.py:55, preprocess/mk_traindata_*:66). Two paths here:

* :func:`connected_components` / :func:`connected_components_with_stats` —
  host path over scipy.ndimage.label (C, fast, exact cv2 semantics with
  8-connectivity); thumbnails are small, this is never a bottleneck.
* :func:`label_propagation` — on-device jnp variant (iterative min-label
  flood) for masks that already live in HBM; CC is inherently sequential,
  so the iteration count is bounded and the result is exact once converged
  (SURVEY.md §7b plan).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi


class CCStats(NamedTuple):
    labels: np.ndarray      # (H, W) int32, 0 = background
    num: int                # number of components incl. background
    stats: np.ndarray       # (num, 5): x, y, w, h, area  (cv2 layout)
    centroids: np.ndarray   # (num, 2): x, y


_STRUCT8 = np.ones((3, 3), dtype=bool)
_STRUCT4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def connected_components(mask: np.ndarray,
                         connectivity: int = 8) -> Tuple[np.ndarray, int]:
    """labels (0=bg) and count incl. background — cv2.connectedComponents
    semantics."""
    structure = _STRUCT8 if connectivity == 8 else _STRUCT4
    labels, n = ndi.label(np.asarray(mask) > 0, structure=structure)
    return labels.astype(np.int32), n + 1


def connected_components_with_stats(mask: np.ndarray,
                                    connectivity: int = 8) -> CCStats:
    labels, num = connected_components(mask, connectivity)
    stats = np.zeros((num, 5), np.int64)
    cents = np.zeros((num, 2), np.float64)
    for k in range(num):
        sel = labels == k
        area = int(sel.sum())
        if area == 0:
            continue
        ys, xs = np.nonzero(sel)
        stats[k] = [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                    ys.max() - ys.min() + 1, area]
        cents[k] = [xs.mean(), ys.mean()]
    return CCStats(labels, num, stats, cents)


def label_propagation(mask: jnp.ndarray, max_iters: int | None = None,
                      connectivity: int = 4) -> jnp.ndarray:
    """On-device CC labeling by iterative min-label propagation.

    Each foreground pixel starts with a unique id; every step takes the min
    over its neighborhood; converges to per-component minima in O(geodesic
    diameter) steps — which can reach O(H·W) for serpentine components, so
    the default cap is H·W (the while_loop exits as soon as a step changes
    nothing, so a generous cap costs nothing once converged). Returns int32
    labels (0 = background, component ids are arbitrary but distinct)."""
    m = mask > 0
    h, w = m.shape
    if max_iters is None:
        max_iters = h * w
    ids = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    big = jnp.int32(h * w + 2)
    lab = jnp.where(m, ids, big)

    def nmin(x):
        out = x
        up = jnp.pad(x[1:, :], ((0, 1), (0, 0)), constant_values=big)
        down = jnp.pad(x[:-1, :], ((1, 0), (0, 0)), constant_values=big)
        left = jnp.pad(x[:, 1:], ((0, 0), (0, 1)), constant_values=big)
        right = jnp.pad(x[:, :-1], ((0, 0), (1, 0)), constant_values=big)
        out = jnp.minimum(jnp.minimum(out, jnp.minimum(up, down)),
                          jnp.minimum(left, right))
        if connectivity == 8:
            for sy in (1, -1):
                for sx in (1, -1):
                    sh = jnp.roll(jnp.roll(x, sy, 0), sx, 1)
                    # roll wraps; mask the wrapped border with big
                    if sy == 1:
                        sh = sh.at[0, :].set(big)
                    else:
                        sh = sh.at[-1, :].set(big)
                    if sx == 1:
                        sh = sh.at[:, 0].set(big)
                    else:
                        sh = sh.at[:, -1].set(big)
                    out = jnp.minimum(out, sh)
        return out

    def cond(state):
        i, cur, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, cur, _ = state
        nxt = jnp.where(m, nmin(cur), big)
        return i + 1, nxt, jnp.any(nxt != cur)

    _, lab, _ = jax.lax.while_loop(cond, body, (0, lab, jnp.array(True)))
    return jnp.where(m, lab, 0).astype(jnp.int32)
