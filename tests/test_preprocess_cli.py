"""Preprocess generators driven through the real CLI dispatcher, plus the
generators that previously had only import coverage."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data import metadata as md


def test_patch_to_cls_via_cli(tmp_path):
    """`python -m wsiseg_tpu preprocess patch-to-cls --flavor bach ...`"""
    rng = np.random.RandomState(0)
    photos = tmp_path / "photos"
    for cls in ("Normal", "Invasive"):
        d = photos / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (64, 96, 3), np.uint8)).save(
            str(d / f"{cls.lower()}_0.png"))
    out = str(tmp_path / "train")

    r = subprocess.run(
        [sys.executable, "-m", "wsiseg_tpu", "preprocess", "patch-to-cls",
         "--flavor", "bach", "--patch_folder", str(photos),
         "--train_image_pth", out, "--tile_w", "32", "--tile_h", "32"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    store = md.load_store(out)
    recs = md.flatten_patches(store)
    assert len(recs) == 2
    assert {int(rec.label) for rec in recs} == {0, 3}


def test_mk_traindata_no_tumors(tmp_path):
    from wsiseg_tpu.preprocess.mk_traindata_no_tumors import generate
    from wsiseg_tpu.slides.reader import SyntheticSlide

    slide = SyntheticSlide(width=4096, height=3072, num_levels=3, seed=4)
    raw = tmp_path / "wsi"
    raw.mkdir()
    np.save(str(raw / "n1.npy"), slide.read_level(0))

    cfg = default_config(tile_w=64, tile_h=64)
    meta = generate(str(raw), str(tmp_path / "out"), cfg)
    recs = md.flatten_patches(meta)
    assert len(recs) > 0
    # normals: every GT crop is all-zero
    g = np.asarray(Image.open(str(recs[0].label)))
    assert (g == 0).all()


def test_breastpathq_cells(tmp_path):
    from wsiseg_tpu.preprocess.breastpathq_cells import generate

    rng = np.random.RandomState(0)
    cells = tmp_path / "cells"
    cells.mkdir()
    img = rng.randint(60, 220, (96, 96, 3), np.uint8)
    Image.fromarray(img).save(str(cells / "1_Region 1_crop.tif"))
    # dot annotation: white background, a few black dots
    dots = np.full((96, 96, 3), 255, np.uint8)
    for y, x in ((20, 20), (50, 70), (80, 30)):
        dots[y, x] = 0
    Image.fromarray(dots).save(str(cells / "1_Region 1_mask.tif"))

    cfg = default_config(tile_w=96, tile_h=96)
    meta = generate(str(cells), str(tmp_path / "out"), cfg)
    recs = md.flatten_patches(meta)
    assert len(recs) == 1
    assert " " not in os.path.basename(recs[0].image_path)
    g = np.asarray(Image.open(str(recs[0].label)))
    # dots dilated into blobs: nonzero but sparse
    assert 0 < (g > 0).sum() < g.size // 2
