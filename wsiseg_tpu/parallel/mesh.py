"""Device mesh + sharding helpers.

The reference has no multi-device support at all (SURVEY.md §2.c: single GPU
via CUDA_VISIBLE_DEVICES). Here scaling is GSPMD-native: one ``Mesh``, batch
arrays sharded on the ``data`` axis, parameters replicated; XLA inserts the
ICI collectives (gradient all-reduce, global BatchNorm statistics) from the
sharding annotations alone.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wsiseg_tpu.config import Config


def make_mesh(cfg: Optional[Config] = None,
              devices: Optional[Sequence] = None,
              shape: Optional[Sequence[int]] = None,
              axes: Optional[Sequence[str]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = tuple(axes or (cfg.mesh_axes if cfg else ("data",)))
    shape = list(shape or (cfg.mesh_shape if cfg else (-1,)))
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """device_put every array in the batch with its leading dim sharded
    (``rng*`` keys — (2,) u32 key data — are replicated instead)."""
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    return {k: jax.device_put(v, rep if k.startswith("rng") else sh)
            for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def canvas_row_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard a (H, W, C) slide canvas by rows — each device owns a stripe of
    the slide (the 'context parallel' analog for WSI stitching,
    SURVEY.md §5 long-context note)."""
    return NamedSharding(mesh, P(axis, None, None))


SPATIAL_KEYS = ("image", "seg_label", "seg_label_s2d")


def shard_batch_spatial(mesh: Mesh, batch: dict, data_axis: str = "data",
                        space_axis: str = "space") -> dict:
    """Stage a train batch onto a 2-D (data, space) mesh: images and dense
    label maps shard on (batch, height), per-row scalars on batch only.

    This is SPATIAL-PARALLEL training — the train-side analog of the
    row-sharded inference canvas (SURVEY.md §5 "long-context" note): each
    device owns a horizontal stripe of every tile, and GSPMD inserts the
    convolution halo exchanges (collective-permutes along ICI) and global
    BatchNorm/loss reductions from the sharding annotations alone. The math
    is IDENTICAL to single-device (global batch stats, global loss sums);
    use it when the per-device batch would otherwise be < 1, i.e. tiles too
    large for one chip's HBM (e.g. 4096² regions).

    The reference has no multi-device support at all (SURVEY.md §2.c)."""
    sp = NamedSharding(mesh, P(data_axis, space_axis))
    dp = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if k.startswith("rng"):
            # (2,) u32 rng key data (train/loop.host_step_keys) —
            # replicated, never sharded
            out[k] = jax.device_put(v, rep)
        elif k in SPATIAL_KEYS and getattr(v, "ndim", 0) >= 3:
            n_space = mesh.shape[space_axis]
            if v.shape[1] % n_space:
                raise ValueError(
                    f"{k} height {v.shape[1]} not divisible by the "
                    f"space axis ({n_space})")
            out[k] = jax.device_put(v, sp)
        else:
            out[k] = jax.device_put(v, dp)
    return out
