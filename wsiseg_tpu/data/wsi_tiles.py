"""Sliding-window tile planning over whole slides.

Twin of reference ``Dataset_wsi(s)`` (utils/dataset.py:83-201): per slide,
compute/cache the tissue mask from the level-2 thumbnail, enumerate the
foreground-gated tile grid with exact reference math, and expose what the
dense-inference engine needs. No per-tile host reads happen here — the
engine uploads the whole level image once and gathers tiles on device.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

from wsiseg_tpu.config import Config
from wsiseg_tpu.ops.geometry import TileGrid, filter_grid_by_mask, wsi_tile_grid
from wsiseg_tpu.ops.tissue import find_nuclei
from wsiseg_tpu.slides import SlideReader, open_slide
from wsiseg_tpu.utils.filesystem import make_folder


@dataclass
class SlidePlan:
    name: str
    slide: SlideReader
    path: Optional[str]
    grid: TileGrid                 # scan-level tile origins (foreground only)
    full_grid_len: int             # before foreground gating
    mask: np.ndarray               # tissue mask at level 2
    mask_path: Optional[str]
    scan_level: int = 2

    @property
    def canvas_hw(self) -> Tuple[int, int]:
        """Heatmap/output canvas dims: level-2 (h, w)
        (reference utils/eval.py:67-71 downsamples predictions to level 2)."""
        w, h = self.slide.level_dimensions[2]
        return h, w

    @property
    def stitch_hw(self) -> Tuple[int, int]:
        """Stitching canvas dims: scan-level (h, w) — predictions are
        overlap-added at the scan level (reference utils/eval.py:45,60) and
        only then downsampled to level 2."""
        w, h = self.slide.level_dimensions[self.scan_level]
        return h, w


def plan_slide(name: str, slide: SlideReader, cfg: Config,
               path: Optional[str] = None,
               mask_cache_dir: Optional[str] = None) -> Optional[SlidePlan]:
    """Returns None when the slide lacks the requested pyramid level
    (reference skips such slides, utils/dataset.py:123-124)."""
    if slide.level_count - 1 < cfg.scan_level or slide.level_count < 3:
        return None

    iw, ih = slide.level_dimensions[cfg.scan_level]

    # tissue mask from the level-2 thumbnail, PNG-cached like the reference
    # (utils/dataset.py:128-137)
    mask = None
    mask_path = None
    if mask_cache_dir:
        make_folder(mask_cache_dir)
        mask_path = os.path.join(mask_cache_dir, f"{name}.png")
        if os.path.exists(mask_path):
            mask = np.asarray(Image.open(mask_path).convert("L"))
    if mask is None:
        thumb = slide.read_level(2)
        mask = np.asarray(find_nuclei(jnp.asarray(thumb)))
        if mask_path:
            Image.fromarray(mask.astype(np.uint8)).save(mask_path)

    # scan-level → level-2 multiplier (utils/dataset.py:144)
    m = (slide.level_downsamples[cfg.scan_level] / slide.level_downsamples[2])

    grid = wsi_tile_grid(iw, ih, cfg.tile_w, cfg.tile_h,
                         cfg.tile_stride_w, cfg.tile_stride_h)
    full_len = len(grid)
    grid = filter_grid_by_mask(grid, mask, m)
    if len(grid) == 0:
        return None
    return SlidePlan(name=name, slide=slide, path=path, grid=grid,
                     full_grid_len=full_len, mask=mask, mask_path=mask_path,
                     scan_level=cfg.scan_level)


class SlideCollection:
    """All slides of a directory (``Case*/*.<ext>`` plus loose files, for
    every extension ``open_slide`` routes — ``reader.glob_slides``), or
    an explicit list of (name, SlideReader)."""

    def __init__(self, source, cfg: Config,
                 mask_cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.plans: Dict[str, SlidePlan] = {}
        mask_dir = mask_cache_dir if mask_cache_dir is not None else cfg.wsi_mask_pth

        if isinstance(source, str):
            from wsiseg_tpu.slides.reader import glob_slides
            paths = glob_slides(source, case_dirs=True)
            entries = [(os.path.basename(p), open_slide(p), p) for p in paths]
        else:
            entries = [(e[0], e[1], e[2] if len(e) > 2 else None)
                       for e in source]

        for name, slide, path in entries:
            plan = plan_slide(name, slide, cfg, path=path,
                              mask_cache_dir=mask_dir)
            if plan is not None:
                self.plans[name] = plan

    def __len__(self) -> int:
        return len(self.plans)

    def items(self):
        return self.plans.items()
