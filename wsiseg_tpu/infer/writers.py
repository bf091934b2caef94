"""Artifact writers with reference-parity file naming.

Produces the same PNG/CSV artifacts as reference utils/eval.py:
``{val_save_pth}/{ep}/{key}_{stride}_heatmap.png`` (:229),
``..._overlay.png`` (:267), color mask ``{key}_{stride}.png`` (:145),
``Ozan_Results_{ep}.csv`` (:367).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from wsiseg_tpu.config import Config
from wsiseg_tpu.utils.filesystem import make_folder


def _out_dir(cfg: Config, ep) -> str:
    d = os.path.join(cfg.val_save_pth, str(ep))
    make_folder(d)
    return d


def save_heatmap(cfg: Config, ep, key: str, heatmap01: np.ndarray) -> str:
    """uint8 heatmap PNG (utils/eval.py:227-229)."""
    pth = os.path.join(_out_dir(cfg, ep),
                       f"{key}_{cfg.tile_stride_w}_heatmap.png")
    Image.fromarray(np.uint8(255 * np.clip(heatmap01, 0, 1))).save(pth)
    return pth


def save_overlay(cfg: Config, ep, key: str, wsi_rgb: np.ndarray,
                 heatmap01: np.ndarray, thresh: float = 0.99) -> str:
    """0.75·wsi + 0.25·255·(heat>thresh) overlay (utils/eval.py:261-267)."""
    hot = (heatmap01 > thresh).astype(np.float32)[..., None]
    out = wsi_rgb.astype(np.float32) * 0.75 + 255.0 * hot * 0.25
    pth = os.path.join(_out_dir(cfg, ep),
                       f"{key}_{cfg.tile_stride_w}_overlay.png")
    Image.fromarray(np.uint8(out)).save(pth)
    return pth


def save_color_mask(cfg: Config, ep, key: str, mask_rgb: np.ndarray,
                    half_size: bool = True) -> str:
    """Class-color mask PNG, saved at half resolution like the reference
    (utils/eval.py:139-145)."""
    img = Image.fromarray(mask_rgb.astype(np.uint8))
    if half_size:
        img = img.resize((img.width // 2, img.height // 2))
    pth = os.path.join(_out_dir(cfg, ep), f"{key}_{cfg.tile_stride_w}.png")
    img.save(pth)
    return pth


def write_breastpathq_csv(ep, rows, out_dir: str = ".") -> str:
    """SPIE BreastPathQ submission CSV (utils/eval.py:367-412).

    rows: iterable of (slide_id, region_id, prediction in [0,1])."""
    pth = os.path.join(out_dir, f"Ozan_Results_{ep}.csv")
    with open(pth, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["slide", "rid", "p"])
        w.writeheader()
        for slide_id, rid, p in rows:
            w.writerow({"slide": slide_id, "rid": rid, "p": p})
    return pth
