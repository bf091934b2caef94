"""Patch dataset over a gt.npy store → fixed-shape multi-task batches.

Host-side twin of reference utils/dataset.py:13-80: reads patch PNGs (and
segmentation-mask PNGs for str labels), applies the train-time geometric
augmentation (random 90° rotation + resize to tile size,
utils/dataset.py:47-59), and emits numpy batches with per-row task masks for
the jit-friendly masked losses. Photometric jitter + normalization run on
device (ops/color.py) where they fuse with the model's first conv.

Batch dict (numpy):
  image      (B, H, W, 3) uint8
  seg_label  (B, H, W) int32     zeros where not seg
  cls_label  (B,) int32          -1 where not cls
  reg_label  (B,) float32        0 where not reg
  is_cls / is_reg / is_seg (B,) float32
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from wsiseg_tpu.config import Config
from wsiseg_tpu.data import metadata as md


class PatchDataset:
    def __init__(self, impth: str, cfg: Config, eval: bool = False,
                 duplicate_dataset: int = 1, seed: int = 0):
        self.cfg = cfg
        self.eval = eval
        store = md.load_store(impth)
        if not store:
            raise FileNotFoundError(f"no gt.npy under {impth}")
        self.records: List[md.PatchRecord] = md.flatten_patches(store)
        if not eval and duplicate_dataset > 1:
            # ×N oversampling (reference utils/dataset.py:30-32)
            self.records = [r for r in self.records for _ in range(duplicate_dataset)]
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.records)

    def _load(self, rec: md.PatchRecord):
        image = Image.open(rec.image_path).convert("RGB")
        if rec.task is md.Task.SEG:
            label = Image.open(str(rec.label))
        else:
            label = Image.fromarray(
                np.zeros((image.size[1], image.size[0]), dtype=np.uint8))

        if not self.eval:
            # random 90° rotation + resize (utils/dataset.py:47-55)
            k = int(self._rng.randint(0, 4))
            if k:
                image = image.rotate(90 * k, expand=True)
                label = label.rotate(90 * k, expand=True)
        image = image.resize((self.cfg.tile_w, self.cfg.tile_h))
        label = label.resize((self.cfg.tile_w, self.cfg.tile_h),
                             Image.NEAREST)
        return np.asarray(image, np.uint8), np.asarray(label).astype(np.int32)

    def batches(self, batch_size: Optional[int] = None,
                shuffle: Optional[bool] = None,
                drop_remainder: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        bs = batch_size or self.cfg.batch_size
        shuffle = (not self.eval) if shuffle is None else shuffle
        order = np.arange(len(self.records))
        if shuffle:
            self._rng.shuffle(order)

        h, w = self.cfg.tile_h, self.cfg.tile_w
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if drop_remainder and len(idx) < bs:
                return
            n = len(idx)
            batch = {
                "image": np.zeros((n, h, w, 3), np.uint8),
                "seg_label": np.zeros((n, h, w), np.int32),
                "cls_label": np.full((n,), -1, np.int32),
                "reg_label": np.zeros((n,), np.float32),
                "is_cls": np.zeros((n,), np.float32),
                "is_reg": np.zeros((n,), np.float32),
                "is_seg": np.zeros((n,), np.float32),
            }
            for bi, ri in enumerate(idx):
                rec = self.records[ri]
                img, lab = self._load(rec)
                batch["image"][bi] = img
                if rec.task is md.Task.SEG:
                    batch["seg_label"][bi] = lab
                    batch["is_seg"][bi] = 1.0
                elif rec.task is md.Task.CLS:
                    batch["cls_label"][bi] = int(rec.label)
                    batch["is_cls"][bi] = 1.0
                else:
                    batch["reg_label"][bi] = float(rec.label)
                    batch["is_reg"][bi] = 1.0
            yield batch


def cls_weights(impth: str, cfg: Config, ignore_index: Optional[int] = None,
                ignore_cls: bool = False, ignore_seg: bool = False):
    """Inverse-frequency class weights from a store, normalized to max 1 —
    twin of reference utils/preprocessing.py:226-276 (cls and seg variants)."""
    store = md.load_store(impth)
    n_cls = np.zeros((cfg.num_classes,), np.int64)
    n_seg = np.zeros((cfg.num_classes,), np.int64)
    for rec in md.flatten_patches(store):
        if rec.task is md.Task.CLS and not ignore_cls:
            n_cls[int(rec.label)] += 1
        elif rec.task is md.Task.SEG and not ignore_seg:
            lab = np.asarray(Image.open(str(rec.label)))
            n_seg += np.bincount(lab.reshape(-1).astype(np.int64),
                                 minlength=cfg.num_classes)[:cfg.num_classes]
    if ignore_index is not None:
        n_cls[ignore_index] = 0
        n_seg[ignore_index] = 0

    def inv(n):
        out = np.zeros((cfg.num_classes,), np.float64)
        nz = np.nonzero(n)[0]
        if len(nz):
            r = n[nz] / (cfg.epsilon + n.sum())
            r = 1.0 / r
            r /= (cfg.epsilon + r.max())
            out[nz] = r
        return out

    return inv(n_cls), inv(n_seg)


def normalize_batch_images(image_u8, cfg: Config, rng=None, train: bool = False):
    """Device-side: uint8 → normalized float32, with optional train-time
    color jitter (reference standard_augmentor, utils/preprocessing.py:206-218).
    Call inside jit; fuses with the model's first conv."""
    import jax.numpy as jnp
    from wsiseg_tpu.ops.color import batch_color_jitter, normalize

    # f64 configs (the repo's exactness-oracle pattern) need f64
    # preprocessing too: f32 ulp noise here amplifies to ~1% relative on
    # isolated grad elements through an untrained full-depth net, burying
    # the f64 oracle's 1e-9 envelope (tests/test_device_cache.py)
    dt = (jnp.float64 if getattr(cfg, "compute_dtype", "") == "float64"
          else jnp.float32)
    img = image_u8.astype(dt) / 255.0
    if train and rng is not None:
        img = batch_color_jitter(img, rng)
    return normalize(img, cfg.dataset_mean, cfg.dataset_std)


def seg_labels_s2d(labels: np.ndarray, f: int = 4) -> np.ndarray:
    """Host-side space-to-depth of an int label map: ``(B, H, W)`` →
    ``(B, H/f, W/f, f²)`` with (fy, fx) sub-position order — the layout
    ``losses.cross_entropy_s2d`` pairs with the train s2d decoder tail's
    logits. Runs in the prefetch thread (numpy); the device-side transpose
    of the same transform measured 85 ms at b128@512² (scripts/exp_r4g.py)."""
    b, h, w = labels.shape
    return np.ascontiguousarray(
        labels.reshape(b, h // f, f, w // f, f)
        .transpose(0, 1, 3, 2, 4).reshape(b, h // f, w // f, f * f))


def add_s2d_seg_labels(batch: Dict, cfg: Config, f: int = 4) -> Dict:
    """Attach ``seg_label_s2d`` to a host batch when the configured model
    will actually emit s2d logits: Unet/Linknet decoder + both s2d train
    flags + the decoder's own divisibility conditions (Unet: dims % 8 —
    its c1/c2 conditions, models/unet.py; Linknet: dims % 4 — c1 at H/2
    must have even dims, decoders.LinknetDecoder.emits_s2d). Leaves
    ``seg_label`` in place — the seg step still needs it for non-xent
    losses / with_dice, and steps fall back to it exactly when the model
    emits native-layout logits."""
    lab = batch.get("seg_label")
    # each decoder class owns its divisibility condition (S2D_LABEL_DIV,
    # kept next to emits_s2d so the two can't silently desynchronize)
    from wsiseg_tpu.models.decoders import LinknetDecoder
    from wsiseg_tpu.models.unet import UNetDecoder
    div = {"Unet": UNetDecoder.S2D_LABEL_DIV,
           "Linknet": LinknetDecoder.S2D_LABEL_DIV}.get(
        getattr(cfg, "model_name", "Unet"))
    if (lab is None or not getattr(cfg, "train_s2d_tail", False)
            or not getattr(cfg, "train_s2d_loss", False)
            or div is None
            or lab.ndim != 3 or lab.shape[1] % div
            or lab.shape[2] % div):
        return batch
    out = dict(batch)
    out["seg_label_s2d"] = seg_labels_s2d(np.asarray(lab), f)
    return out
