"""Tumor-free (normal) training tiles — reference
``preprocess/mk_traindata_sunny_no_tumors.py``.

For each tumor-free slide, the tissue mask's connected components become
regions and centered tiles are extracted with an all-zero GT raster
(mk_traindata_sunny_no_tumors.py:66-71). Slides with too few pyramid levels
are skipped (:84-85).
"""

from __future__ import annotations

import glob

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from wsiseg_tpu.config import Config, parse_args
from wsiseg_tpu.data import metadata as md
from wsiseg_tpu.preprocess.mk_traindata_centered import generate_for_slide
from wsiseg_tpu.slides.reader import SlideReader, glob_slides, open_slide
from wsiseg_tpu.utils.filesystem import make_folder


def tissue_regions_mask(slide: SlideReader, cfg: Config) -> np.ndarray:
    """Tissue mask at scan level — region source for normal slides."""
    import jax.numpy as jnp

    from wsiseg_tpu.ops.tissue import find_nuclei

    thumb = slide.read_level(2)
    mask = np.asarray(find_nuclei(jnp.asarray(thumb)))
    iw, ih = slide.level_dimensions[cfg.scan_level]
    if mask.shape != (ih, iw):
        mask = np.asarray(Image.fromarray(mask.astype(np.uint8)).resize(
            (iw, ih), Image.NEAREST))
    return (mask > 0).astype(np.uint8)


def generate(raw_pth: str, out_pth: str, cfg: Config,
             slide_names: Optional[List[str]] = None) -> dict:
    """``slide_names`` optionally restricts to a hand-picked tumor-free list
    (the reference hard-codes 50 names, :53-60)."""
    make_folder(out_pth)
    metadata = md.load_store(out_pth)
    patch_id = 0
    for wsipath in glob_slides(raw_pth):
        if slide_names is not None and \
                os.path.basename(wsipath) not in slide_names:
            continue
        slide = open_slide(wsipath)
        if slide.level_count < 3:
            continue
        # all-zero GT: every extracted tile trains as "normal"; regions come
        # from the tissue mask (mk_traindata_sunny_no_tumors.py:66-71)
        mask = tissue_regions_mask(slide, cfg)
        patch_id = generate_for_slide(
            slide, wsipath, np.zeros_like(mask), cfg, out_pth, metadata,
            patch_id, region_support=mask)
    md.save_store(metadata, out_pth)
    return metadata


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg = parse_args(argv)
    meta = generate(cfg.raw_train_pth, cfg.train_image_pth, cfg)
    print(f"wrote {sum(len(v) for v in meta.values())} tiles")


if __name__ == "__main__":
    main()
