"""Device-resident epoch cache — relay-free steady-state training epochs.

A real training epoch must push every batch through the host→device link
(on this machine the 10-50 MB/s axon relay: b128 × 512² × 3 u8 ≈ 100 MB
per 278 ms step, i.e. 2-10 s of upload per step — see the measured
`train_e2e_*` bench keys). But epochs revisit the SAME patches, so the
TPU-native fix is to upload the u8 dataset ONCE and index/shuffle on
device: after the one-time build, a steady-state epoch moves only a (B,)
i32 index array per step. This is the TPU counterpart of the reference's
worker-pool DataLoader (utils/dataset.py:72-78), which hides disk latency
but still feeds the bus every step.

Contents stay in uint8 on device (images, seg labels, and the
precomputed s2d label view) and are widened/normalized INSIDE the jitted
step, after the gather — so HBM holds the dataset at 1 byte/px and the
normalize fuses into the model's first conv exactly as the host-fed path
does (data/patches.normalize_batch_images).

Exactness: feeding the cached step the indices of a host batch matches
the host-fed step under the same rng split discipline — proven by an f64
oracle (sgd updates agree to 1e-7 abs; tests/test_device_cache.py). At
f32 the two graphs differ only by conv reduction-order noise (the
normalize fuses into the step graph where the host path jits it
separately), the repo's documented conditioning envelope.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.config import Config
from wsiseg_tpu.data.patches import normalize_batch_images

# fields gathered per step; everything else is step-invariant
_LABEL_KEYS = ("seg_label", "seg_label_s2d", "cls_label", "reg_label",
               "is_cls", "is_reg", "is_seg")


class DeviceEpochCache:
    """The uploaded dataset: a dict of device arrays with a shared leading
    N axis. Build once with :meth:`build`, then drive epochs with
    :meth:`index_batches` + a step from :func:`make_cached_hybrid_train_step`.
    """

    def __init__(self, arrays: Dict[str, jax.Array], n: int):
        self.arrays = arrays
        self.n = n

    @classmethod
    def build(cls, batches: Iterable[Dict[str, np.ndarray]], cfg: Config,
              max_bytes: Optional[int] = None,
              log=lambda s: None) -> "DeviceEpochCache":
        """Concatenate host batches (u8 images, as produced by
        PatchDataset.batches) and upload each field once. Seg labels are
        narrowed to u8 on device (num_classes ≤ 255 always holds) and the
        s2d label view is precomputed host-side so the per-step gather
        never pays the 85 ms device transpose (data/patches.seg_labels_s2d).

        ``max_bytes`` caps the cache (stops consuming batches once image
        bytes would exceed it) so a dataset larger than HBM degrades to a
        partial cache instead of an allocation failure; the caller sees
        the actual size in ``.n``.
        """
        from wsiseg_tpu.data.patches import add_s2d_seg_labels

        fields: Dict[str, list] = {}
        img_bytes = 0
        for b in batches:
            b = add_s2d_seg_labels(dict(b), cfg)
            img = np.asarray(b["image"])
            if img.dtype != np.uint8:
                raise ValueError(
                    "DeviceEpochCache wants uint8 host images (normalize "
                    f"runs on device, inside the step); got {img.dtype}")
            if max_bytes is not None and img_bytes + img.nbytes > max_bytes:
                cached = sum(x.shape[0] for x in fields.get("image", []))
                log(f"device cache capped at {max_bytes/1e9:.2f} GB — "
                    f"caching {cached} rows; the rest of the epoch must "
                    "be host-fed")
                break
            img_bytes += img.nbytes
            fields.setdefault("image", []).append(img)
            for k in _LABEL_KEYS:
                if k in b:
                    fields.setdefault(k, []).append(np.asarray(b[k]))
        if "image" not in fields:
            raise ValueError("no batches to cache")
        host = {k: np.concatenate(v, axis=0) for k, v in fields.items()}
        n = host["image"].shape[0]
        for k in ("seg_label", "seg_label_s2d"):
            if k in host:
                assert host[k].max(initial=0) < 256
                host[k] = host[k].astype(np.uint8)
        arrays = {k: jax.device_put(v) for k, v in host.items()}
        for v in arrays.values():
            v.block_until_ready()
        total = sum(v.nbytes for v in arrays.values())
        log(f"device epoch cache: {n} rows, {total/1e9:.2f} GB uploaded once")
        return cls(arrays, n)

    def index_batches(self, batch_size: int, seed: int = 0,
                      epoch: int = 0,
                      drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """Per-epoch shuffled (B,) i32 index batches — the only per-step
        host→device traffic (≈ 4·B bytes)."""
        perm = np.random.RandomState((seed * 100003 + epoch) & 0x7FFFFFFF
                                     ).permutation(self.n).astype(np.int32)
        end = self.n - (self.n % batch_size) if drop_remainder else self.n
        for i in range(0, max(end, 0), batch_size):
            idx = perm[i:i + batch_size]
            if len(idx) == batch_size or not drop_remainder:
                yield idx


def gather_batch(arrays: Dict[str, jax.Array], idx: jax.Array, cfg: Config,
                 rng=None, train: bool = True) -> Dict[str, jax.Array]:
    """In-jit: gather the batch rows and reproduce the host-fed batch
    contract exactly — normalized f32 images (+ train jitter under
    ``rng``), i32 label maps."""
    b = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
    b["image"] = normalize_batch_images(b["image"], cfg, rng, train=train)
    for k in ("seg_label", "seg_label_s2d", "cls_label"):
        if k in b:
            b[k] = b[k].astype(jnp.int32)
    return b


def make_cached_hybrid_train_step(model, tx, cfg: Config, **step_kwargs):
    """Cached twin of train.steps.make_hybrid_train_step: the returned
    ``step(state, arrays, idx, rng)`` gathers + preprocesses on device and
    runs the SAME hybrid loss/update. rng discipline mirrors the Trainer
    loop (rng → (sub, pp): pp drives the color jitter, sub the step), so
    a host-fed step given the same splits matches to fusion rounding. Callers
    jit with ``donate_argnums=0`` (the cache arrays in arg 1 must NOT be
    donated — they are reused every step)."""
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    base = make_hybrid_train_step(model, tx, cfg, **step_kwargs)

    def step(state, arrays, idx, rng):
        sub, pp = jax.random.split(rng)
        return base(state, gather_batch(arrays, idx, cfg, rng=pp,
                                        train=True), sub)

    return step
