"""Artifact-level reference parity (round-4 VERDICT next #3).

`test_torch_parity.py` proves logit parity per tile; nothing previously
ran the FULL pipeline both ways. Here a torch Y-Net replica (grafted
checkpoint) drives a verbatim-semantics numpy port of the reference's
predict_tumorbed seg path — per-tile forward, overlap-add canvas
(utils/eval.py:208-214), threshold_probs softmax/zero/argmax
(utils/preprocessing.py:156-172), tissue-masked P(DCIS)+P(invasive)
heatmap with u8 truncation (utils/eval.py:217-229) — and the result is
compared against the engine's grid mode running the SAME grafted
weights: canvas max|Δ|, labels identical away from decision boundaries,
TB mask IoU ≈ 1. A stitching or postprocess bug that preserves per-tile
logits fails here and nowhere else.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import _TorchYNet  # noqa: E402

from wsiseg_tpu.config import default_config  # noqa: E402
from wsiseg_tpu.data.wsi_tiles import plan_slide  # noqa: E402
from wsiseg_tpu.infer.engine import DenseInferenceEngine  # noqa: E402
from wsiseg_tpu.models.torch_import import apply_pretrained  # noqa: E402
from wsiseg_tpu.models.ynet import init_ynet  # noqa: E402
from wsiseg_tpu.slides.reader import SyntheticSlide  # noqa: E402

TILE = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    torch.manual_seed(2)
    tm = _TorchYNet()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
    tm.eval()
    pth = str(tmp_path_factory.mktemp("ckpt") / "model_resnet18_3.pt")
    torch.save({"epoch": 3, "state_dict": tm.state_dict()}, pth)

    cfg = default_config(tile_w=TILE, tile_h=TILE, tile_stride_w=32,
                         tile_stride_h=32, compute_dtype="float32",
                         infer_batch_size=8)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    variables = apply_pretrained(variables, pth)
    engine = DenseInferenceEngine(model, variables, cfg)

    slide = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=5)
    plan = plan_slide("parity", slide, cfg, mask_cache_dir=None)
    assert plan is not None and len(plan.grid) > 4
    return cfg, tm, engine, plan


def _reference_oracle(cfg, tm, plan, mask_full):
    """Verbatim numpy port of the reference seg eval path on this plan's
    grid (grid parity itself is covered by the geometry tests)."""
    hs, ws = plan.stitch_hw
    level = np.asarray(plan.slide.read_level(cfg.scan_level))
    C = cfg.num_classes
    # utils/eval.py:183-214 — planar f32 canvas, logits overlap-added
    pred = np.zeros((C, hs, ws), np.float64)
    mean = np.asarray(cfg.dataset_mean, np.float32)
    std = np.asarray(cfg.dataset_std, np.float32)
    dy, dx = cfg.tile_h, cfg.tile_w
    with torch.no_grad():
        for y, x in zip(plan.grid.ys, plan.grid.xs):
            tile = level[y:y + dy, x:x + dx].astype(np.float32) / 255.0
            tile = (tile - mean) / std
            seg, _, _ = tm(torch.from_numpy(
                tile.transpose(2, 0, 1)[None]))
            pred[:, y:y + dy, x:x + dx] += seg.numpy()[0]
    # utils/preprocessing.py:156-172 threshold_probs
    e = np.exp(pred - pred.max(axis=0, keepdims=True))
    probs = e / e.sum(axis=0, keepdims=True)
    for cj in range(C):
        probs[cj, probs[cj] < cfg.class_probs[cj]] = 0
    labels = np.argmax(probs, axis=0).astype(np.uint8)
    # utils/eval.py:217-229 — seg-mode heatmap, tissue-masked, u8 TRUNCATED
    heat = (probs[2] + probs[3]) * (mask_full > 0)
    heat_u8 = np.uint8(255 * heat)
    return pred, labels, heat_u8


def test_grid_mode_matches_reference_pipeline(setup):
    cfg, tm, engine, plan = setup
    hs, ws = plan.stitch_hw
    mask_full = np.asarray(engine._resize_mask_to(plan.mask, (hs, ws)))

    res = engine.predict_slide(plan, keep_canvas=True, keep_probs=True)
    pred, labels, heat_u8 = _reference_oracle(cfg, tm, plan, mask_full)

    # 1. logit canvas: graft tolerance (2e-3/tile) × up to 4× overlap
    canvas = np.asarray(res.canvas).transpose(2, 0, 1)
    assert np.abs(canvas - pred).max() < 2e-2

    # 2. labels: identical away from decision boundaries (where the two
    # frameworks' fp noise can legitimately flip an argmax)
    e = np.exp(pred - pred.max(axis=0, keepdims=True))
    probs = e / e.sum(axis=0, keepdims=True)
    top2 = np.sort(probs, axis=0)[-2:]
    margin = top2[1] - top2[0]
    decided = margin > 1e-2
    assert decided.mean() > 0.5, "degenerate fixture: no decided pixels"
    np.testing.assert_array_equal(res.labels[decided], labels[decided])
    assert (res.labels != labels).mean() < 0.01

    # 3. heatmap artifact: engine rounds where the reference truncates
    # (np.uint8(255*x)) — equal to within one u8 step on decided pixels
    eng_u8 = np.round(np.asarray(res.heatmap) * 255).astype(np.int32)
    assert np.abs(eng_u8 - heat_u8.astype(np.int32))[decided].max() <= 1

    # 4. tumor-bed mask agreement (labels > 0, the TB support): IoU ≈ 1
    tb_e, tb_o = res.labels > 0, labels > 0
    inter, union = (tb_e & tb_o).sum(), (tb_e | tb_o).sum()
    assert union > 0 and inter / union > 0.995


def test_tb_iou_metric_matches_oracle(setup):
    """The evaluator's TB IoU against ground truth is the same number
    whether computed from the engine's labels or the oracle's."""
    from wsiseg_tpu.infer.metrics import foreground_iou

    cfg, tm, engine, plan = setup
    hs, ws = plan.stitch_hw
    mask_full = np.asarray(engine._resize_mask_to(plan.mask, (hs, ws)))
    res = engine.predict_slide(plan)
    _, labels, _ = _reference_oracle(cfg, tm, plan, mask_full)

    gt = np.asarray(plan.slide.ground_truth(cfg.scan_level))[:hs, :ws]
    iou_e = foreground_iou(np.asarray(res.labels), gt)
    iou_o = foreground_iou(labels, gt)
    assert abs(iou_e - iou_o) < 1e-3
