"""Patch-level evaluators: TTA regression, classification, BreastPathQ CSV
(infer/evaluators twins of utils/eval.py:289-449)."""

import csv
import os

import jax
import numpy as np
import pytest
from PIL import Image

from wsiseg_tpu.config import default_config
from wsiseg_tpu.infer.evaluators import (predict_breastpathq, predict_cls,
                                         predict_reg)
from wsiseg_tpu.models.ynet import init_ynet

TILE = 32


@pytest.fixture(scope="module")
def setup():
    cfg = default_config(tile_w=TILE, tile_h=TILE, compute_dtype="float32")
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def _batch(rng, n=6):
    return {
        "image": rng.randint(0, 255, (n, TILE, TILE, 3)).astype(np.uint8),
        "cls_label": np.arange(n, dtype=np.int32) % 4,
        "reg_label": np.linspace(0, 1, n).astype(np.float32),
        "is_cls": np.ones(n, np.float32),
        "is_reg": np.ones(n, np.float32),
        "is_seg": np.zeros(n, np.float32),
    }


def test_predict_reg_tta(setup, rng):
    cfg, model, variables = setup
    rep = predict_reg(model, variables, cfg, [_batch(rng)],
                      log=lambda s: None)
    assert set(rep) >= {"l1", "mse"}
    assert np.isfinite(rep["l1"]) and rep["l1"] >= 0


def test_predict_cls(setup, rng):
    cfg, model, variables = setup
    out = predict_cls(model, variables, cfg, [_batch(rng)],
                      log=lambda s: None)
    assert 0.0 <= out["acc"] <= 1.0
    assert len(out["classwise_acc"]) == 4


def test_predict_breastpathq_csv(setup, rng, tmp_path):
    cfg, model, variables = setup
    patches = tmp_path / "patches"
    patches.mkdir()
    rows = ["slide,rid,y"]
    for iid, rid in [(7, 1), (7, 2)]:
        Image.fromarray(
            rng.randint(0, 255, (TILE, TILE, 3)).astype(np.uint8)).save(
                str(patches / f"{iid}_{rid}.tif"))
        rows.append(f"{iid},{rid},0.5")
    csv_pth = str(tmp_path / "labels.csv")
    with open(csv_pth, "w") as f:
        f.write("\n".join(rows))

    out = predict_breastpathq(model, variables, cfg, ep=3,
                              dataset_path=str(patches),
                              label_csv_path=csv_pth,
                              out_dir=str(tmp_path))
    assert os.path.basename(out) == "Ozan_Results_3.csv"
    with open(out) as f:
        recs = list(csv.DictReader(f))
    assert len(recs) == 2
    for r in recs:
        assert 0.0 <= float(r["p"]) <= 1.0   # clamped (utils/eval.py:408)
