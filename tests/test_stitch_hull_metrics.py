import numpy as np
import jax.numpy as jnp
import pytest
import scipy.spatial

from wsiseg_tpu.infer import metrics as M
from wsiseg_tpu.ops import hull, stitch


# ---- stitch ----

def test_scatter_add_overlap_matches_numpy(rng):
    canvas = np.zeros((40, 40, 3), np.float32)
    tiles = rng.randn(5, 16, 16, 3).astype(np.float32)
    ys = np.array([0, 8, 8, 24, 0], np.int32)
    xs = np.array([0, 8, 0, 24, 24], np.int32)
    expected = canvas.copy()
    for b in range(5):
        expected[ys[b]:ys[b] + 16, xs[b]:xs[b] + 16] += tiles[b]
    got = np.asarray(stitch.scatter_add_tiles(
        jnp.asarray(canvas), jnp.asarray(tiles), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_gather_tiles(rng):
    img = rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
    ys = np.array([0, 10], np.int32)
    xs = np.array([5, 20], np.int32)
    got = np.asarray(stitch.gather_tiles(jnp.asarray(img), jnp.asarray(ys),
                                         jnp.asarray(xs), 8, 8))
    np.testing.assert_array_equal(got[0], img[0:8, 5:13])
    np.testing.assert_array_equal(got[1], img[10:18, 20:28])


def test_scatter_add_scalar_tiles():
    canvas = np.zeros((16, 16, 2), np.float32)
    vals = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    ys = np.array([0, 4], np.int32)
    xs = np.array([0, 4], np.int32)
    got = np.asarray(stitch.scatter_add_scalar_tiles(
        jnp.asarray(canvas), jnp.asarray(vals), jnp.asarray(ys),
        jnp.asarray(xs), 8, 8))
    assert got[0, 0].tolist() == [1.0, 2.0]
    assert got[5, 5].tolist() == [4.0, 6.0]  # overlap region
    assert got[10, 10].tolist() == [3.0, 4.0]


def test_overlap_count():
    ys = np.array([0, 0], np.int32)
    xs = np.array([0, 4], np.int32)
    cnt = np.asarray(stitch.overlap_count((8, 12), jnp.asarray(ys),
                                          jnp.asarray(xs), 8, 8))
    assert cnt[0, 0] == 1 and cnt[0, 5] == 2 and cnt[0, 11] == 1


# ---- hull ----

def test_convex_hull_vertices_match_scipy(rng):
    pts = rng.randint(0, 100, (60, 2))
    ours = hull.convex_hull_points(pts)
    ref = scipy.spatial.ConvexHull(pts.astype(float))
    ref_vertices = set(map(tuple, pts[ref.vertices]))
    assert set(map(tuple, ours)) == ref_vertices


def test_convex_hull_image_covers_mask(rng):
    mask = np.zeros((64, 64), np.uint8)
    mask[10:20, 10:20] = 1
    mask[40:50, 40:50] = 1
    out = hull.convex_hull_image(mask)
    # hull contains the original mask
    assert (out[mask > 0] == 1).all()
    # hull contains the connecting band between the blobs
    assert out[30, 30] == 1
    # hull stays within bounding box of the points
    assert out[5, 5] == 0 and out[60, 60] == 0
    # empty mask → empty hull
    assert hull.convex_hull_image(np.zeros((8, 8), np.uint8)).sum() == 0


def test_fill_polygon_area():
    sq = np.array([[2, 2], [10, 2], [10, 10], [2, 10]])
    out = hull.fill_polygon(sq, (16, 16))
    assert out[5, 5] == 1 and out[0, 0] == 0
    assert abs(int(out.sum()) - 81) <= 18  # 9x9 filled ± boundary convention


def test_concave_hull_tracks_nonconvex_shape():
    # L-shaped point cloud: concave hull should exclude the empty quadrant
    pts = []
    for y in range(0, 30, 2):
        for x in range(0, 30, 2):
            if x < 12 or y < 12:
                pts.append((x, y))
    pts = np.asarray(pts)
    ch = hull.concave_hull_points(pts, k=8)
    assert len(ch) >= 4
    mask = hull.fill_polygon(ch, (30, 30))
    # the notch interior must be outside the concave hull...
    assert mask[18, 18] == 0
    # ...but inside the convex hull
    cx = hull.fill_polygon(hull.convex_hull_points(pts), (30, 30))
    assert cx[18, 18] == 1
    # both arms of the L stay covered
    assert mask[2, 26] == 1 and mask[26, 2] == 1
    # tight boundary: concave area well below convex area
    assert mask.sum() < 0.9 * cx.sum()


# ---- metrics ----

def test_iou_and_dice():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:5] = True
    b[2:7] = True
    assert M.iou(a, b) == pytest.approx(30 / 70, abs=1e-6)
    assert M.dice_coefficient(a, b) == pytest.approx(60 / 100, abs=1e-6)


def test_f1_and_accuracy_hand_values():
    gts = [1, 1, 0, 0, 1]
    preds = [1, 0, 0, 1, 1]
    # tp=2 fp=1 fn=1 → f1 = 4/6
    assert M.f1_score(gts, preds) == pytest.approx(2 / 3)
    assert M.accuracy(gts, preds) == pytest.approx(3 / 5)
    prec, rec = M.precision_recall(gts, preds)
    assert prec == pytest.approx(2 / 3) and rec == pytest.approx(2 / 3)


def test_confusion_matrix_and_classwise():
    cm = M.confusion_matrix([0, 0, 1, 2], [0, 1, 1, 2], 3)
    assert cm.tolist() == [[1, 1, 0], [0, 1, 0], [0, 0, 1]]
    cw = M.classwise_accuracy(cm)
    np.testing.assert_allclose(cw, [0.5, 1.0, 1.0])


def test_roc_auc_known_cases():
    assert M.roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert M.roc_auc([0, 1, 0, 1], [0.9, 0.1, 0.8, 0.2]) == 0.0
    assert M.roc_auc([0, 1], [0.5, 0.5]) == 0.5


def test_spie_score_perfect_is_one():
    gt = np.array([[0, 1], [2, 3]])
    assert M.spie_score(gt, gt) == pytest.approx(1.0)
    worse = M.spie_score(np.array([[3, 3], [3, 3]]), gt)
    assert worse < 1.0


def test_regression_report():
    rep = M.regression_report([0.1, 0.5, 0.9], [0.0, 0.5, 1.0])
    assert rep["l1"] == pytest.approx(0.2 / 3, abs=1e-6)
    assert rep["pearson_r"] > 0.99
