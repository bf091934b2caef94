import jax
import jax.numpy as jnp
import numpy as np

from wsiseg_tpu.ops import geometry, kmeans, resize, threshold, tissue


# ---- threshold_probs (oracle mirrors reference utils/preprocessing.py:156-172) ----

def _ref_threshold_probs(pred_chw, class_probs):
    e = np.exp(pred_chw - pred_chw.max(0, keepdims=True))
    probs = e / e.sum(0, keepdims=True)
    for cj, t in enumerate(class_probs):
        probs[cj][probs[cj] < t] = 0
    return np.argmax(probs, 0).astype(np.uint8), probs


def test_threshold_probs_matches_reference_math(rng):
    logits_hwc = rng.randn(16, 16, 4).astype(np.float32)
    class_probs = [0.0, 0.3, 0.6, 0.0]
    labels, probs = threshold.threshold_probs(jnp.asarray(logits_hwc), class_probs)
    ref_labels, ref_probs = _ref_threshold_probs(
        logits_hwc.transpose(2, 0, 1).copy(), class_probs)
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    np.testing.assert_allclose(
        np.asarray(probs).transpose(2, 0, 1), ref_probs, atol=1e-5)


def test_pred_to_mask_colors():
    labels = np.zeros((8, 8), np.uint8)
    labels[0, 0] = 1
    labels[1, 1] = 2
    labels[2, 2] = 3
    out = np.asarray(threshold.pred_to_mask(jnp.asarray(labels), 4))
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 1].tolist() == [0, 255, 0]
    assert out[2, 2].tolist() == [0, 0, 255]
    assert out[4, 4].tolist() == [0, 0, 0]


# ---- tissue ----

def test_find_nuclei_hsv_detects_saturated_tissue():
    img = np.full((32, 32, 3), 250, np.uint8)       # white background
    img[8:24, 8:24] = [150, 60, 170]                 # purple tissue
    img[0:4, 0:4] = [250, 235, 240]                  # pale pink, sat 0.06 < 0.1
    mask = np.asarray(tissue.find_nuclei(jnp.asarray(img)))
    assert mask[16, 16] == 1
    assert mask[30, 30] == 0
    assert mask[1, 1] == 0   # pink removed at default mu_percent


def test_find_nuclei_fill_mask_closes_holes():
    img = np.full((64, 64, 3), 250, np.uint8)
    img[16:48, 16:48] = [150, 60, 170]
    img[28:34, 28:34] = 250                          # hole inside tissue
    mask = np.asarray(tissue.find_nuclei(jnp.asarray(img), fill_mask=True))
    assert mask[30, 30] == 1


def test_foreground_fractions_matches_loop(rng):
    mask = (rng.rand(64, 64) < 0.3).astype(np.uint8)
    ys = np.array([0, 5, 30, 50], np.int32)
    xs = np.array([0, 10, 20, 40], np.int32)
    dy = dx = 12
    fr = np.asarray(tissue.foreground_fractions(
        jnp.asarray(mask), jnp.asarray(ys), jnp.asarray(xs), dy, dx))
    for i in range(len(ys)):
        win = mask[ys[i]:ys[i] + dy, xs[i]:xs[i] + dx]
        np.testing.assert_allclose(fr[i], np.count_nonzero(win) / (dy * dx), atol=1e-6)


# ---- geometry (exact reference grid math) ----

def _ref_wsi_grid(iw, ih, pw, ph, sw, sh):
    # literal transcription of the loop structure in utils/dataset.py:147-166
    out = []
    for ypos in range(1, ih - 1 - ph, sh):
        for xpos in range(1, iw - 1 - pw, sw):
            out.append((xpos, ypos))
    xpos = iw - 1 - pw
    for ypos in range(1, ih - 1 - ph, sh):
        out.append((xpos, ypos))
    ypos = ih - 1 - ph
    for xpos in range(1, iw - 1 - pw, sw):
        out.append((xpos, ypos))
    return out


def test_wsi_tile_grid_exact():
    iw, ih, pw, ph, sw, sh = 1333, 977, 512, 512, 128, 128
    g = geometry.wsi_tile_grid(iw, ih, pw, ph, sw, sh)
    ref = _ref_wsi_grid(iw, ih, pw, ph, sw, sh)
    got = list(zip(g.xs.tolist(), g.ys.tolist()))
    assert got == ref


def test_tile_image_grid_degenerate():
    g = geometry.tile_image_grid(100, 100, 512, 512, 128, 128)
    assert len(g) == 1 and g.xs[0] == 0 and g.ys[0] == 0


def test_map_points():
    pts = np.array([[10, 10], [100, 100], [1, 1]])
    mapped, n = geometry.map_points(pts, scan_level=1, tile_w=64, tile_h=64,
                                    iw=2000, ih=2000)
    # 10*4-32=8 → valid; 100*4-32=368 → valid; 1*4-32=-28 → culled
    assert n == 2
    np.testing.assert_array_equal(mapped[0], [8, 8])
    np.testing.assert_array_equal(mapped[1], [368, 368])


def test_filter_grid_by_mask():
    mask = np.zeros((64, 64), np.uint8)
    mask[:32, :32] = 1
    g = geometry.TileGrid(np.array([0, 160], np.int32), np.array([0, 160], np.int32),
                          32, 32, 256, 256)
    # mask at quarter scale of scan level
    f = geometry.filter_grid_by_mask(g, mask, 0.25)
    assert len(f) == 1 and f.xs[0] == 0


def test_nextpow2():
    assert geometry.nextpow2(500) == 512
    assert geometry.nextpow2(512) == 512
    assert geometry.nextpow2(513) == 1024


# ---- kmeans ----

def test_kmeans_separates_clear_clusters(rng):
    a = rng.randn(50, 2) * 0.1 + [0, 0]
    b = rng.randn(50, 2) * 0.1 + [10, 10]
    c = rng.randn(50, 2) * 0.1 + [0, 10]
    pts = np.concatenate([a, b, c]).astype(np.float32)
    centers, labels = kmeans.kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 3)
    centers = np.asarray(centers)
    labels = np.asarray(labels)
    # each true cluster maps to one distinct predicted cluster
    ids = [np.bincount(labels[i * 50:(i + 1) * 50], minlength=3).argmax() for i in range(3)]
    assert len(set(ids)) == 3
    sorted_centers = centers[np.argsort(centers.sum(1))]
    np.testing.assert_allclose(sorted_centers, [[0, 0], [0, 10], [10, 10]], atol=0.5)


def test_quantize_image_reduces_palette(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    q = np.asarray(kmeans.quantize_image(jax.random.PRNGKey(0), jnp.asarray(img), 4))
    palette = np.unique(q.reshape(-1, 3), axis=0)
    assert palette.shape[0] <= 4
    # n_colors < 2 → identity
    same = kmeans.quantize_image(jax.random.PRNGKey(0), jnp.asarray(img), 0)
    np.testing.assert_array_equal(np.asarray(same), img)


def test_mask_keypoints_centers_inside_region():
    mask = np.zeros((128, 128), np.uint8)
    mask[32:96, 32:96] = 1
    k, centers = kmeans.mask_keypoints(jax.random.PRNGKey(0), mask, us=2, min_clusters=4)
    assert k == 4
    assert ((centers >= 28) & (centers <= 100)).all()
    # tiny region → None (reference utils/regiontools.py:86-87)
    tiny = np.zeros((16, 16), np.uint8)
    tiny[4:6, 4:6] = 1
    k2, c2 = kmeans.mask_keypoints(jax.random.PRNGKey(0), tiny, us=2, min_clusters=4)
    assert k2 is None and c2 is None


# ---- resize ----

def test_resize_shapes_and_dtype(rng):
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    out = resize.resize_bilinear(jnp.asarray(img), 16, 24)
    assert out.shape == (16, 24, 3) and out.dtype == jnp.uint8
    lab = (rng.rand(32, 48) * 3).astype(np.int32)
    outl = resize.resize_nearest(jnp.asarray(lab), 16, 24)
    assert outl.shape == (16, 24) and outl.dtype == jnp.int32
    assert set(np.unique(np.asarray(outl))) <= set(np.unique(lab))


def test_threshold_probs_planar_matches_hwc(rng):
    from wsiseg_tpu.ops.threshold import threshold_probs, \
        threshold_probs_planar
    logits = rng.randn(33, 41, 4).astype(np.float32)
    cp = (0.4, 0.45, 0.5, 0.55)
    l1, p1 = threshold_probs(jnp.asarray(logits), cp)
    l2, p2 = threshold_probs_planar(jnp.asarray(logits), cp)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(p1),
                               np.asarray(p2).transpose(1, 2, 0), atol=1e-6)
