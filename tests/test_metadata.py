import numpy as np

from wsiseg_tpu.data import metadata as md


def test_task_dispatch_by_label_type():
    # Mirrors reference utils/dataset.py:62-66 semantics.
    assert md.task_of("mask.png") is md.Task.SEG
    assert md.task_of(2) is md.Task.CLS
    assert md.task_of(0.37) is md.Task.REG
    assert md.task_of(np.int64(1)) is md.Task.CLS
    assert md.task_of(np.float32(0.5)) is md.Task.REG


def test_store_roundtrip(tmp_path):
    store = {}
    md.add_patch(store, "slideA", 0, "/x/a0.png", 1)
    md.add_patch(store, "slideA", 1, "/x/a1.png", 0.5)
    md.add_patch(store, "slideB", 0, "/x/b0.png", "/x/b0_mask.png")

    pth = md.save_store(store, str(tmp_path))
    assert pth.endswith("gt.npy")

    loaded = md.load_store(str(tmp_path))
    recs = md.flatten_patches(loaded)
    assert len(recs) == 3
    tasks = sorted(r.task.value for r in recs)
    assert tasks == ["cls", "reg", "seg"]


def test_store_reference_format_compat(tmp_path):
    # A store written exactly the way the reference writes it
    # (preprocess/patch_to_gt.py:94-104) must load.
    gt = {"f.png": {0: {"wsi": "tiles/0.png", "label": 2}}}
    np.save(tmp_path / "gt.npy", gt)
    loaded = md.load_store(str(tmp_path))
    assert md.flatten_patches(loaded)[0].label == 2


def test_hr_iteration_skips_patch_bucket():
    store = {
        "P": {0: {"wsipath": "p.png", "label": 1, "dimensions": (64, 64)}},
        "s.svs": {
            1: {0: {"cnt_xy": np.zeros((8, 2)), "perim_xy": np.zeros((8, 2)),
                    "label": 3, "wsipath": "s.svs", "scan_level": 1}},
        },
    }
    regions = list(md.iter_hr_regions(store))
    assert len(regions) == 1
    assert regions[0]["label"] == 3


def test_class_counts():
    store = {}
    md.add_patch(store, "a", 0, "x.png", 1)
    md.add_patch(store, "a", 1, "y.png", 1)
    md.add_patch(store, "a", 2, "z.png", 3)
    md.add_patch(store, "a", 3, "w.png", 0.2)  # reg: not counted
    counts = md.class_counts(store, 4)
    assert counts.tolist() == [0, 2, 0, 1]
