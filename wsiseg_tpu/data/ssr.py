"""Same-sized-region (SSR) datasets.

Twin of reference ``utils/dataset_ssr.py``: segmentation pairs
``*_image.png`` / ``*_gt.png`` (RGB mask → argmax class labels with an
implicit background channel, :50-52), and a gt.npy-backed classification
variant (:72-107). Both oversample ×10 for training (:30-32, :89-91).

Batches are fixed-shape numpy dicts (image uint8 HWC; labels int32) feeding
the jitted seg/cls train steps; photometric jitter + normalization run on
device (data/patches.normalize_batch_images).
"""

from __future__ import annotations

import glob
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from wsiseg_tpu.config import Config
from wsiseg_tpu.data import metadata as md
from wsiseg_tpu.utils.filesystem import fix_path

SSR_SIZE = 512  # reference resizes every region to 512×512 (dataset_ssr.py:47-48)


class SSRSegDataset:
    """Paired image/GT region segmentation dataset."""

    def __init__(self, impth: str, cfg: Config, eval: bool = False,
                 duplicate: int = 10, seed: int = 0):
        self.cfg = cfg
        self.eval = eval
        self._rng = np.random.RandomState(seed)
        self.datalist: List[dict] = [
            {"image": pth, "label": pth.replace("_image.png", "_gt.png")}
            for pth in sorted(glob.glob(f"{impth}/*_image.png"))]
        if not self.datalist:
            raise FileNotFoundError(f"no *_image.png under {impth}")
        if not eval and duplicate > 1:
            self.datalist = [d for d in self.datalist for _ in range(duplicate)]

    def __len__(self) -> int:
        return len(self.datalist)

    def _load(self, item: dict):
        image = Image.open(item["image"]).convert("RGB")
        label = Image.open(item["label"])
        if not self.eval:
            k = int(self._rng.randint(0, 4))
            if k:
                image = image.rotate(90 * k, expand=True)
                label = label.rotate(90 * k, expand=True)
        image = image.resize((SSR_SIZE, SSR_SIZE))
        label = label.resize((SSR_SIZE, SSR_SIZE))
        lab = np.asarray(label)
        if lab.ndim == 3:
            # RGB mask → class index with implicit background channel 0
            # (reference dataset_ssr.py:50-52)
            lab = np.concatenate(
                [np.zeros((*lab.shape[:2], 1), lab.dtype), lab], axis=-1)
            lab = np.argmax(lab, axis=-1)
        return np.asarray(image, np.uint8), lab.astype(np.int32)

    def batches(self, batch_size: Optional[int] = None,
                shuffle: Optional[bool] = None) -> Iterator[Dict[str, np.ndarray]]:
        bs = batch_size or self.cfg.batch_size
        shuffle = (not self.eval) if shuffle is None else shuffle
        order = np.arange(len(self.datalist))
        if shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            n = len(idx)
            batch = {
                "image": np.zeros((n, SSR_SIZE, SSR_SIZE, 3), np.uint8),
                "seg_label": np.zeros((n, SSR_SIZE, SSR_SIZE), np.int32),
            }
            for bi, ri in enumerate(idx):
                img, lab = self._load(self.datalist[ri])
                batch["image"][bi] = img
                batch["seg_label"][bi] = lab
            yield batch


def cls_ratios_ssr(impth: str, cfg: Config, ignore_index=None,
                   option: str = "segmentation") -> np.ndarray:
    """Class distribution of an SSR dataset — twin of reference
    utils/preprocessing.py:279-309. ``segmentation`` bincounts the argmax
    of every ``*_gt.png`` RGB mask (with the implicit background channel);
    ``classification`` counts gt.npy labels."""
    numsamples = np.zeros((cfg.num_classes,), np.float64)
    if option == "classification":
        store = md.load_store(impth)
        for key in store:
            for tile_id in store[key]:
                numsamples[int(store[key][tile_id]["label"])] += 1
    else:
        for pth in sorted(glob.glob(f"{impth}/*_gt.png")):
            lab = np.asarray(Image.open(pth))
            if lab.ndim == 3:
                lab = np.concatenate(
                    [np.zeros((*lab.shape[:2], 1), lab.dtype), lab], -1)
                lab = np.argmax(lab, -1)
            numsamples += np.bincount(
                lab.reshape(-1).astype(np.int64),
                minlength=cfg.num_classes)[:cfg.num_classes]
    if ignore_index is not None:
        numsamples[ignore_index] = 0
    total = numsamples.sum()
    return numsamples / total if total > 0 else numsamples


def cls_ratios_hr(impth: str, cfg: Config, ignore_index=None) -> np.ndarray:
    """Class distribution of an HR region store — twin of reference
    utils/preprocessing.py:312-355 (the dataset-side equivalent is
    ``HRRegionDataset.cls_ratios``, computed with the same validity
    filter)."""
    from wsiseg_tpu.data.regions import HRRegionDataset

    ds = HRRegionDataset(impth, cfg, eval=True)
    ratios = np.asarray(ds.cls_ratios, np.float64)
    if ignore_index is not None:
        ratios = ratios.copy()
        ratios[ignore_index] = 0
        total = ratios.sum()
        ratios = ratios / total if total > 0 else ratios
    return ratios


class SSRClsDataset:
    """gt.npy-backed region classification dataset
    (reference dataset_ssr.py:72-107)."""

    def __init__(self, impth: str, cfg: Config, eval: bool = False,
                 duplicate: int = 10, seed: int = 0):
        self.cfg = cfg
        self.eval = eval
        self._rng = np.random.RandomState(seed)
        store = md.load_store(impth)
        if not store:
            raise FileNotFoundError(f"no gt.npy under {impth}")
        self.datalist: List[dict] = []
        for key in store:
            for tile_id in store[key]:
                rec = store[key][tile_id]
                self.datalist.append({"image": fix_path(rec["image"]),
                                      "label": int(rec["label"])})
        if not eval and duplicate > 1:
            self.datalist = [d for d in self.datalist for _ in range(duplicate)]

    def __len__(self) -> int:
        return len(self.datalist)

    def batches(self, batch_size: Optional[int] = None,
                shuffle: Optional[bool] = None) -> Iterator[Dict[str, np.ndarray]]:
        bs = batch_size or self.cfg.batch_size
        shuffle = (not self.eval) if shuffle is None else shuffle
        order = np.arange(len(self.datalist))
        if shuffle:
            self._rng.shuffle(order)
        h, w = self.cfg.tile_h, self.cfg.tile_w
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            n = len(idx)
            batch = {
                "image": np.zeros((n, h, w, 3), np.uint8),
                "cls_label": np.zeros((n,), np.int32),
            }
            for bi, ri in enumerate(idx):
                item = self.datalist[ri]
                img = Image.open(item["image"]).convert("RGB")
                if not self.eval:
                    k = int(self._rng.randint(0, 4))
                    if k:
                        img = img.rotate(90 * k, expand=True)
                img = img.resize((w, h))
                batch["image"][bi] = np.asarray(img, np.uint8)
                batch["cls_label"][bi] = item["label"]
            yield batch
