"""HR region dataset + keypoints (data/regions) and SSR datasets (data/ssr)."""

import numpy as np
import pytest
from PIL import Image

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data import metadata as md
from wsiseg_tpu.data.regions import (HR_NUM_SAMPLES, HR_PATCH_H, HR_PATCH_W,
                                     HRRegionDataset, HRRegionEvalDataset,
                                     get_key_points, get_key_points_for_patch,
                                     remove_white_region, validate_hr)
from wsiseg_tpu.data.ssr import SSR_SIZE, SSRClsDataset, SSRSegDataset


# ---------- keypoints ----------

def test_get_key_points_blob():
    mask = np.zeros((128, 128), np.uint8)
    mask[32:96, 32:96] = 1
    n, pts, out, fg = get_key_points(mask, us=2, min_clusters=4)
    assert n == 4
    assert pts.shape == (4, 2)
    # centers land inside the blob (x, y order)
    for x, y in pts:
        assert 24 <= x <= 104 and 24 <= y <= 104
    assert out.shape == mask.shape
    assert len(fg[0]) > 0


def test_get_key_points_too_small():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:13, 10:13] = 1
    n, pts, out, fg = get_key_points(mask, us=1, min_clusters=8)
    assert n is None and pts is None


def test_get_key_points_for_patch():
    kp = get_key_points_for_patch((2048, 1536))
    assert kp["cnt_xy"].shape[1] == 2
    assert kp["perim_xy"].shape[1] == 2
    assert kp["scan_level"] == 1
    assert len(kp["cnt_xy"]) == 8
    assert len(kp["perim_xy"]) >= 8


def test_remove_white_region():
    mask = np.zeros((256, 256), np.uint8)
    mask[:, :128] = 1    # left half tissue
    # scan_level 0 → windows are tile-sized at mask resolution
    arr = np.array([[10, 10], [200, 10]])
    out, n = remove_white_region(mask, arr, scan_level=0, tile_w=32,
                                 tile_h=32, thresh=0.9)
    assert n == 1
    np.testing.assert_array_equal(out, [[10, 10]])
    out, n = remove_white_region(mask, None, 0, 32, 32)
    assert out is None and n == 0


# ---------- HR dataset over a synthetic store ----------

@pytest.fixture(scope="module")
def hr_store(tmp_path_factory):
    """Store with one .npy-backed slide region + one 'P' patch."""
    root = tmp_path_factory.mktemp("hr_store")
    rng = np.random.RandomState(0)

    # synthetic slide saved as .npy (ArraySlide backend)
    level0 = np.full((4096, 4096, 3), 240, np.uint8)
    level0[512:3584, 512:3584] = rng.randint(60, 200, (3072, 3072, 3))
    slide_pth = str(root / "slide.npy")
    np.save(slide_pth, level0)

    # region keypoints at scan level 2 (level-2 dims = 256²)
    n, cnt, _, _ = get_key_points(
        np.ones((180, 180), np.uint8), us=2, min_clusters=8)
    assert n == 8
    cnt = cnt + 38   # shift into the tissue block
    perim = np.stack([np.linspace(40, 216, 24),
                      np.linspace(40, 216, 24)], axis=1).astype(np.int64)

    # plain 'P' patch photo
    photo_pth = str(root / "photo.png")
    Image.fromarray(rng.randint(0, 255, (1536, 2048, 3), np.uint8)).save(
        photo_pth)

    store = {
        "P": {0: {0: {"cnt_xy": None, "perim_xy": None, "label": 1,
                      "wsipath": photo_pth, "scan_level": None,
                      "dimensions": (2048, 1536)}}},
        "slide.npy": {1: {0: {"cnt_xy": cnt, "perim_xy": perim, "label": 2,
                              "wsipath": slide_pth, "scan_level": 2}}},
    }
    md.save_store(store, str(root))
    return str(root)


def test_hr_dataset_batches(hr_store):
    cfg = default_config(batch_size=2, compute_dtype="float32")
    ds = HRRegionDataset(hr_store, cfg)
    assert len(ds) == 2
    assert ds.cls_ratios.shape == (4,)
    assert abs(ds.cls_ratios.sum() - 1.0) < 1e-6
    batches = list(ds.batches())
    b = batches[0]
    assert b["image"].shape == (2, HR_NUM_SAMPLES, HR_PATCH_H, HR_PATCH_W, 3)
    assert b["image"].dtype == np.uint8
    assert set(b["cls_label"].tolist()) == {1, 2}


def test_hr_train_step_and_validate(hr_store):
    import jax
    import jax.numpy as jnp

    from wsiseg_tpu.cli.common import setup_hr, variables_of
    from wsiseg_tpu.data.patches import normalize_batch_images
    from wsiseg_tpu.train.steps import make_hr_train_step

    cfg = default_config(batch_size=2, compute_dtype="float32", lr=1e-3)
    model, tx, state, _ = setup_hr(cfg)
    step = jax.jit(make_hr_train_step(model, tx, cfg))

    ds = HRRegionDataset(hr_store, cfg)
    batch = next(ds.batches())
    img = jnp.asarray(batch["image"])
    b, p = img.shape[:2]
    flat = normalize_batch_images(img.reshape(b * p, *img.shape[2:]), cfg)
    dev_batch = {"image": flat.reshape(b, p, *flat.shape[1:]),
                 "cls_label": jnp.asarray(batch["cls_label"])}
    state2, metrics = step(state, dev_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1

    # eval-mode dataset + validate_hr wiring
    val = HRRegionDataset(hr_store, cfg, eval=True)
    variables = variables_of(state)

    @jax.jit
    def forward(images_u8):
        x = jnp.asarray(images_u8)
        bb, pp = x.shape[:2]
        f = normalize_batch_images(x.reshape(bb * pp, *x.shape[2:]), cfg)
        return model.apply(variables, f.reshape(bb, pp, *f.shape[1:]))

    out = validate_hr(forward, val, cfg)
    assert 0.0 <= out["acc"] <= 1.0
    assert len(out["classwise_acc"]) == 4


def test_hr_eval_dataset(hr_store):
    from wsiseg_tpu.slides.reader import open_slide

    cfg = default_config(batch_size=4, compute_dtype="float32")
    store = md.load_store(hr_store)
    region = store["slide.npy"][1][0]
    metadata = {0: {**region, "tile_id": 7}}
    ds = HRRegionEvalDataset(metadata, cfg)
    assert len(ds) == 1
    b = next(ds.batches())
    assert b["image"].shape == (1, HR_NUM_SAMPLES, HR_PATCH_H, HR_PATCH_W, 3)
    assert b["tile_id"][0] == 7


# ---------- SSR ----------

@pytest.fixture(scope="module")
def ssr_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssr")
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (256, 256, 3), np.uint8)
        gt = np.zeros((256, 256, 3), np.uint8)
        gt[:128, :, i % 3] = 255  # one-hot RGB mask
        Image.fromarray(img).save(str(root / f"{i}_image.png"))
        Image.fromarray(gt).save(str(root / f"{i}_gt.png"))
    return str(root)


def test_ssr_seg_dataset(ssr_dir):
    cfg = default_config(batch_size=2, compute_dtype="float32")
    ds = SSRSegDataset(ssr_dir, cfg, eval=True)
    assert len(ds) == 3
    b = next(ds.batches())
    assert b["image"].shape == (2, SSR_SIZE, SSR_SIZE, 3)
    assert b["seg_label"].shape == (2, SSR_SIZE, SSR_SIZE)
    # RGB→argmax with background channel: top half class c+1, bottom 0
    assert set(np.unique(b["seg_label"])) <= {0, 1, 2, 3}
    # (±4 rows: PIL resize bleeds at the class boundary, as in the reference)
    assert (b["seg_label"][:, :SSR_SIZE // 2 - 4] > 0).all()
    assert (b["seg_label"][:, SSR_SIZE // 2 + 4:] == 0).all()


def test_ssr_seg_oversampling(ssr_dir):
    cfg = default_config(batch_size=2, compute_dtype="float32")
    ds = SSRSegDataset(ssr_dir, cfg, eval=False)
    assert len(ds) == 30  # ×10 (reference dataset_ssr.py:30-32)


def test_ssr_cls_dataset(tmp_path):
    cfg = default_config(batch_size=2, tile_w=64, tile_h=64,
                         compute_dtype="float32")
    rng = np.random.RandomState(0)
    store = {}
    for i in range(4):
        pth = str(tmp_path / f"r{i}.png")
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(pth)
        store[f"s{i}"] = {0: {"image": pth, "label": i % 4, "times": 1}}
    md.save_store(store, str(tmp_path))

    ds = SSRClsDataset(str(tmp_path), cfg, eval=True)
    assert len(ds) == 4
    b = next(ds.batches())
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["cls_label"].shape == (2,)


def test_cls_ratios_ssr_segmentation(ssr_dir):
    from wsiseg_tpu.data.ssr import cls_ratios_ssr
    cfg = default_config()
    r = cls_ratios_ssr(ssr_dir, cfg)
    # fixtures: top half one-hot class (i%3)+1, bottom half background
    assert abs(r.sum() - 1.0) < 1e-9
    assert abs(r[0] - 0.5) < 1e-6          # background = half of every mask
    assert all(abs(r[c] - 0.5 / 3) < 1e-6 for c in (1, 2, 3))
    # ignore_index zeroes a class without renormalizing (reference
    # utils/preprocessing.py:306-309 divides before zeroing)
    r0 = cls_ratios_ssr(ssr_dir, cfg, ignore_index=0)
    assert r0[0] == 0.0


def test_cls_ratios_ssr_classification(tmp_path):
    from wsiseg_tpu.data.ssr import cls_ratios_ssr
    cfg = default_config()
    store = {f"s{i}": {0: {"image": "x.png", "label": i % 2}}
             for i in range(4)}
    md.save_store(store, str(tmp_path))
    r = cls_ratios_ssr(str(tmp_path), cfg, option="classification")
    np.testing.assert_allclose(r, [0.5, 0.5, 0.0, 0.0])


def test_cls_ratios_hr(hr_store):
    from wsiseg_tpu.data.ssr import cls_ratios_hr
    cfg = default_config(compute_dtype="float32")
    r = cls_ratios_hr(hr_store, cfg)
    assert abs(r.sum() - 1.0) < 1e-9
    np.testing.assert_allclose(r, [0.0, 0.5, 0.5, 0.0])
