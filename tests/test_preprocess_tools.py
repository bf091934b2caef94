"""Preprocess generators + paper tools, hermetic on synthetic data."""

import os

import numpy as np
import pytest
from PIL import Image

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data import metadata as md


@pytest.fixture(scope="module")
def photos_dir(tmp_path_factory):
    """BACH-like class folders of photos."""
    root = tmp_path_factory.mktemp("photos")
    rng = np.random.RandomState(0)
    for cls in ("Normal", "Benign", "InSitu", "Invasive"):
        d = root / cls
        d.mkdir()
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
                    str(d / f"{cls.lower()}{i:02d}.png"))
    return str(root)


@pytest.fixture(scope="module")
def synthetic_slide_dir(tmp_path_factory):
    """Synthetic slide (npy) with a matching GT raster at level 2."""
    from wsiseg_tpu.slides.reader import SyntheticSlide

    root = tmp_path_factory.mktemp("wsi")
    slide = SyntheticSlide(width=4096, height=3072, num_levels=3, seed=1)
    np.save(str(root / "s1.npy"), slide.read_level(0))
    gt2 = slide.ground_truth(2)
    return str(root), gt2


def test_patch_to_gt(photos_dir, tmp_path):
    from wsiseg_tpu.preprocess.patch_to_gt import generate

    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "train")
    meta = generate(photos_dir, out, cfg)
    recs = md.flatten_patches(meta)
    assert len(recs) == 8
    # labels are GT raster paths (seg task) with constant class codes
    assert all(r.task is md.Task.SEG for r in recs)
    invasive = [r for r in recs if "invasive" in r.image_path]
    g = np.asarray(Image.open(str(invasive[0].label)))
    assert (g == 3).all()
    # reloadable through the standard patch dataset
    from wsiseg_tpu.data.patches import PatchDataset
    ds = PatchDataset(out, cfg, eval=True)
    assert len(ds) == 8


def test_patch_to_cls_bach(photos_dir, tmp_path):
    from wsiseg_tpu.preprocess.patch_to_cls import generate_bach

    cfg = default_config(tile_w=64, tile_h=64)
    meta = generate_bach(photos_dir, str(tmp_path / "cls"), cfg)
    recs = md.flatten_patches(meta)
    assert len(recs) == 8
    assert all(r.task is md.Task.CLS for r in recs)
    assert sorted({int(r.label) for r in recs}) == [0, 1, 2, 3]


def test_patch_to_cls_breastpathq(tmp_path):
    from wsiseg_tpu.preprocess.patch_to_cls import generate_breastpathq

    rng = np.random.RandomState(0)
    patches = tmp_path / "patches"
    patches.mkdir()
    rows = ["slide,rid,y"]
    for iid, rid, cell in [(1, 1, 0.0), (1, 2, 0.4), (2, 1, 0.9)]:
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            str(patches / f"{iid}_{rid}.tif"))
        rows.append(f"{iid},{rid},{cell}")
    csv_pth = str(tmp_path / "labels.csv")
    with open(csv_pth, "w") as f:
        f.write("\n".join(rows))

    cfg = default_config(tile_w=32, tile_h=32)
    meta = generate_breastpathq(str(patches), csv_pth,
                                str(tmp_path / "out"), cfg, regression=True)
    recs = md.flatten_patches(meta)
    assert len(recs) == 3
    assert all(r.task is md.Task.REG for r in recs)
    assert {float(r.label) for r in recs} == {0.0, 0.4, 0.9}


def test_patch_to_cls_breakhis(tmp_path):
    """BreakHis tree walk (reference patch_to_cls_breakhis.py:23-52):
    only <mag> images kept; ductal carcinoma → 2, other malignant → 3."""
    from wsiseg_tpu.preprocess.patch_to_cls import generate_breakhis

    rng = np.random.RandomState(0)
    root = tmp_path / "breakhis" / "malignant" / "SOB"
    layout = [
        ("ductal_carcinoma/SOB_M_DC_14-2523/40X", "dc0.png", True),
        ("ductal_carcinoma/SOB_M_DC_14-2523/40X", "dc1.png", True),
        ("lobular_carcinoma/SOB_M_LC_14-13412/40X", "lc0.png", True),
        # non-40X magnification and non-png must be skipped
        ("ductal_carcinoma/SOB_M_DC_14-2523/100X", "dc2.png", False),
        ("lobular_carcinoma/SOB_M_LC_14-13412/40X", "notes.txt", False),
    ]
    for sub, name, _ in layout:
        d = root / sub
        d.mkdir(parents=True, exist_ok=True)
        if name.endswith(".png"):
            Image.fromarray(rng.randint(0, 255, (48, 56, 3),
                                        np.uint8)).save(str(d / name))
        else:
            (d / name).write_text("x")

    cfg = default_config(tile_w=32, tile_h=32)
    out = str(tmp_path / "out")
    meta = generate_breakhis(str(tmp_path / "breakhis"), out, cfg)
    recs = md.flatten_patches(meta)
    assert len(recs) == 3
    assert all(r.task is md.Task.CLS for r in recs)
    by_name = {os.path.basename(r.image_path): int(r.label) for r in recs}
    assert by_name == {"w_dc0.png_0.png": 2, "w_dc1.png_0.png": 2,
                       "w_lc0.png_0.png": 3}
    for r in recs:
        assert os.path.exists(r.image_path)
        assert Image.open(r.image_path).size == (32, 32)


def test_ssr_patch_to_gt_classification(photos_dir, tmp_path):
    """Classification option (reference ssr_patch_to_gt.py): image copies
    + gt.npy records with the ×7 oversampling hint, loadable by the SSR
    cls dataset."""
    from wsiseg_tpu.preprocess import ssr_patch_to_gt

    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "ssr_cls")
    meta = ssr_patch_to_gt.generate(photos_dir, out, cfg,
                                    option="classification")
    assert len(meta) == 8
    for filename, tiles in meta.items():
        rec = tiles[0]
        assert rec["times"] == 7
        assert os.path.exists(rec["image"])
        assert Image.open(rec["image"]).size == (64, 64)
    labels = sorted({t[0]["label"] for t in meta.values()})
    assert labels == [0, 1, 2, 3]
    # reloadable through the SSR cls dataset path
    from wsiseg_tpu.data.ssr import SSRClsDataset
    ds = SSRClsDataset(out, cfg)
    assert len(ds) > 0


def test_ssr_patch_to_gt_segmentation(photos_dir, tmp_path):
    """Segmentation option: *_image.png + constant one-hot RGB *_gt.png
    per class (reference ssr_patch_to_gt.py:49-53)."""
    from wsiseg_tpu.preprocess import ssr_patch_to_gt

    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "ssr_seg")
    ssr_patch_to_gt.generate(photos_dir, out, cfg, option="segmentation")
    imgs = sorted(f for f in os.listdir(out) if f.endswith("_image.png"))
    gts = sorted(f for f in os.listdir(out) if f.endswith("_gt.png"))
    assert len(imgs) == 8 and len(gts) == 8
    # class code c>0 → channel c-1 set; Normal (code 0) → all-zero GT
    g_inv = np.asarray(Image.open(os.path.join(out,
                                               "invasive00.png_gt.png")))
    assert (g_inv[..., 2] == 255).all() and (g_inv[..., :2] == 0).all()
    g_nrm = np.asarray(Image.open(os.path.join(out,
                                               "normal00.png_gt.png")))
    assert (g_nrm == 0).all()
    # pairs load through the SSR seg dataset
    from wsiseg_tpu.data.ssr import SSRSegDataset
    ds = SSRSegDataset(out, cfg)
    assert len(ds) > 0


def test_mk_traindata_centered(synthetic_slide_dir, tmp_path):
    from wsiseg_tpu.preprocess.mk_traindata_centered import generate_for_slide
    from wsiseg_tpu.slides.reader import open_slide

    root, gt2 = synthetic_slide_dir
    wsipath = os.path.join(root, "s1.npy")
    slide = open_slide(wsipath)
    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "train")
    os.makedirs(out, exist_ok=True)
    metadata = {}
    n = generate_for_slide(slide, wsipath, gt2.astype(np.uint8), cfg, out,
                           metadata, 0)
    assert n > 0
    recs = md.flatten_patches(metadata)
    assert len(recs) == n
    # image/GT pairs are tile-sized and class codes subset of GT's
    img = np.asarray(Image.open(recs[0].image_path))
    g = np.asarray(Image.open(str(recs[0].label)))
    assert img.shape[2] == 3 and img.shape[0] == img.shape[1]
    assert g.shape == img.shape[:2]
    assert set(np.unique(g)) <= set(np.unique(gt2)) | {0}


def test_makedata_ssr_classification(synthetic_slide_dir, tmp_path):
    from wsiseg_tpu.preprocess.makedata_ssr import generate_for_slide
    from wsiseg_tpu.slides.reader import open_slide

    root, gt2 = synthetic_slide_dir
    wsipath = os.path.join(root, "s1.npy")
    slide = open_slide(wsipath)
    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "ssr")
    os.makedirs(out, exist_ok=True)
    metadata = {}
    n = generate_for_slide(slide, wsipath, gt2.astype(np.uint8), cfg, out,
                           metadata, 0, option="classification")
    assert n > 0
    # one resized region image per CC + mode-class labels
    fname = os.path.basename(wsipath)
    labels = [metadata[fname][t]["label"] for t in metadata[fname]]
    assert all(1 <= l <= 3 for l in labels)
    img = Image.open(metadata[fname][next(iter(metadata[fname]))]["image"])
    assert img.size == (64, 64)


def test_makedata_ssr_segmentation(synthetic_slide_dir, tmp_path):
    from wsiseg_tpu.preprocess.makedata_ssr import generate_for_slide
    from wsiseg_tpu.slides.reader import open_slide

    root, gt2 = synthetic_slide_dir
    wsipath = os.path.join(root, "s1.npy")
    slide = open_slide(wsipath)
    cfg = default_config(tile_w=64, tile_h=64)
    out = str(tmp_path / "ssr_seg")
    os.makedirs(out, exist_ok=True)
    n = generate_for_slide(slide, wsipath, gt2.astype(np.uint8), cfg, out,
                           {}, 0, option="segmentation")
    assert n > 0
    # pairs readable by the SSR dataset
    from wsiseg_tpu.data.ssr import SSRSegDataset
    ds = SSRSegDataset(out, cfg, eval=True)
    assert len(ds) == n


def test_collage(photos_dir, tmp_path):
    from wsiseg_tpu.preprocess.collage_of_patches import gallery, generate

    arr = np.arange(4 * 2 * 3 * 1).reshape(4, 2, 3, 1)
    g = gallery(arr, 2)
    assert g.shape == (4, 6, 1)

    cfg = default_config(tile_w=32, tile_h=32, tile_stride_w=32,
                         tile_stride_h=32, scan_level=1, scan_resize=1)
    meta = generate(photos_dir, str(tmp_path / "collage"), cfg,
                    ncols=4, photo_hw=(96 * 16, 128 * 16))
    recs = md.flatten_patches(meta)
    assert len(recs) > 0
    img = np.asarray(Image.open(recs[0].image_path))
    assert img.shape == (32, 32, 3)


def test_region_proposal_points_patch(photos_dir, tmp_path):
    from wsiseg_tpu.preprocess.region_proposal_points import generate_patch

    cfg = default_config()
    meta = generate_patch(photos_dir, str(tmp_path / "hr"), cfg)
    assert "P" in meta
    items = meta["P"][0]
    assert len(items) == 8
    first = items[0]
    assert first["dimensions"] == (128, 96)
    assert first["cnt_xy"] is None


def test_mk_gt_artifacts(tmp_path):
    """mk_gt writes the four artifacts for an Aperio-annotated slide."""
    from wsiseg_tpu.preprocess.mk_gt import generate_for_slide
    from wsiseg_tpu.slides.reader import ArraySlide

    level0 = np.full((4096, 4096, 3), 240, np.uint8)
    slide = ArraySlide(level0, num_levels=3)
    wsipath = str(tmp_path / "a.npy")

    xml = """<?xml version="1.0"?>
<Annotations MicronsPerPixel="0.25">
 <Annotation>
  <Dummy/>
  <Regions>
   <Region Text="invasive carcinoma">
    <Attributes><Attribute Value="invasive carcinoma"/></Attributes>
    <Vertices>
     <Vertex X="512" Y="512"/><Vertex X="2048" Y="512"/>
     <Vertex X="2048" Y="2048"/><Vertex X="512" Y="2048"/>
    </Vertices>
   </Region>
  </Regions>
 </Annotation>
</Annotations>"""
    xmlpath = str(tmp_path / "a.xml")
    with open(xmlpath, "w") as f:
        f.write(xml)

    cfg = default_config()
    paths = generate_for_slide(slide, wsipath, xmlpath, cfg,
                               out_dir=str(tmp_path))
    for key in ("tumor_bed", "mask", "mask_rgb", "find_nuclei"):
        assert os.path.exists(paths[key]), key
    gt = np.asarray(Image.open(paths["mask"]))
    assert gt.shape == (256, 256)
    assert 3 in np.unique(gt)          # invasive = class 3
    tb = np.asarray(Image.open(paths["tumor_bed"]))
    assert tb.max() == 255


# ---------- paper tools ----------

def test_overlay_tumor_bed():
    from wsiseg_tpu.paper_tools.overlay_tb_wsi import overlay_tumor_bed

    rng = np.random.RandomState(0)
    wsi = rng.randint(0, 255, (128, 128, 3), np.uint8)
    hm = np.zeros((128, 128), np.uint8)
    hm[40:100, 40:100] = 250   # hot block
    out = overlay_tumor_bed(wsi, hm, open_size=5, dilate_size=3)
    assert out["overlay"].shape == wsi.shape
    assert out["tb_perim"].max() == 255
    # perimeter painted black on the overlay
    yy, xx = np.where(out["tb_perim"] > 0)
    assert (out["overlay"][yy, xx] == 0).all()


def test_screen_slides(tmp_path):
    from wsiseg_tpu.paper_tools.check_for_false_positives import (
        screen_heatmap, screen_slides)

    hot = np.zeros((256, 256), np.uint8)
    hot[50:200, 50:200] = 255
    cold = np.zeros((256, 256), np.uint8)
    assert screen_heatmap(hot, open_size=10) == 1
    assert screen_heatmap(cold, open_size=10) == 0

    p_hot = str(tmp_path / "1_heatmap.png")
    p_cold = str(tmp_path / "2_heatmap.png")
    Image.fromarray(hot).save(p_hot)
    Image.fromarray(cold).save(p_cold)
    out = screen_slides([(1, p_hot), (2, p_cold)], annotated_ids=[1],
                        log=lambda s: None)
    assert out["acc"] == 1.0
    assert out["f1"] == 1.0
