"""Contour resampling (ops/contour) + proposal pipelines (proposals)."""

import numpy as np
import pytest

from wsiseg_tpu.ops.contour import (evenly_spaced_points_on_a_contour,
                                    interparc, sort_clockwise)
from wsiseg_tpu.proposals import (cc_proposals, perimeter_keypoints,
                                  slic_proposals)


# ---------- contour ----------

def test_sort_clockwise_square():
    # interleaved layout: (x0..x3, y0..y3)
    pts = [0, 2, 2, 0, 0, 0, 2, 2]  # (0,0), (2,2), (2,0), (0,2)
    out = sort_clockwise(pts)
    n = len(out) // 2
    coords = [(out[i], out[i + n]) for i in range(n)]
    assert coords[0] == (0, 0)          # closest to origin first
    assert set(coords) == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_evenly_spaced_points_straight_line():
    pts = np.array([[0, 0], [10, 0]])
    out = evenly_spaced_points_on_a_contour(pts, 6)
    np.testing.assert_allclose(out[:, 0], np.linspace(0, 10, 6))
    np.testing.assert_allclose(out[:, 1], 0)


def test_interparc_closes_and_uniform():
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    out = interparc(square, 17)
    # closed: first == last (t=0 and t=1 both map to the start)
    np.testing.assert_allclose(out[0], out[-1], atol=1e-9)
    # uniform spacing along the 16-length perimeter
    d = np.linalg.norm(np.diff(out, axis=0), axis=1)
    np.testing.assert_allclose(d, 1.0, atol=1e-9)


def test_interparc_degenerate():
    out = interparc(np.array([[3.0, 3.0], [3.0, 3.0]]), 5)
    np.testing.assert_allclose(out, 3.0)


# ---------- proposals ----------

def test_perimeter_keypoints_square():
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 1
    pts = perimeter_keypoints(mask, num_points=8)
    assert pts.shape[1] == 2
    assert len(pts) >= 8
    # all points on the square's border ring
    for x, y in pts:
        assert 16 <= x <= 47 and 16 <= y <= 47
        assert x in (16, 47) or y in (16, 47)


def test_slic_and_cc_proposals():
    # two well-separated blobs as fake label image
    labels = np.zeros((200, 200), np.int32)
    labels[20:90, 20:90] = 1
    labels[110:190, 110:190] = 2
    meta = slic_proposals(labels, "slide.npy")
    # each valid region got 8 centers + perimeter points
    for m in meta.values():
        assert m["cnt_xy"].shape == (8, 2)
        assert m["perim_xy"].shape[1] == 2
        assert m["scan_level"] == 2

    # CC proposals: small blobs (bbox ≤ 5% of image) take the one-proposal
    # path (scannet.py:82-96)
    cc_labels = np.zeros((400, 400), np.int32)
    cc_labels[20:60, 20:60] = 1       # 1% bbox → small path
    cc_labels[200:250, 200:250] = 2
    cc_meta = cc_proposals(cc_labels, "slide.npy")
    assert len(cc_meta) >= 1
    for m in cc_meta.values():
        assert m["cnt_xy"].shape[1] == 2


def test_classify_proposals_paints_regions():
    """End-to-end: proposals over a synthetic slide + stub ensemble."""
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.proposals import classify_proposals
    from wsiseg_tpu.slides.reader import ArraySlide

    cfg = default_config(batch_size=4, compute_dtype="float32")
    level0 = np.full((4096, 4096, 3), 240, np.uint8)
    level0[256:3840, 256:3840] = 128
    slide = ArraySlide(level0, num_levels=3)

    # blob = id 1; id 2 exists so the reference's range(max()) quirk
    # (slic.py:56 iterates 0..max-1) still covers the blob
    labels = np.zeros((256, 256), np.int32)
    labels[40:216, 40:216] = 1
    labels[0:8, 0:8] = 2
    meta = slic_proposals(labels, "mem", scan_level=2)
    assert 1 in meta

    def fake_forward(images_u8):
        b = images_u8.shape[0]
        logits = np.zeros((b, 4), np.float32)
        logits[:, 3] = 10.0     # always class 3
        return logits

    mask = classify_proposals(fake_forward, meta, labels.shape, cfg,
                              slide=slide)
    assert mask.shape == labels.shape
    painted = mask[labels == 1]
    assert (painted == 3).mean() > 0.5
