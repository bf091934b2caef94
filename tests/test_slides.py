import numpy as np
import pytest

from wsiseg_tpu.slides import ArraySlide, SyntheticSlide, SlideReader


def test_array_slide_pyramid_geometry():
    img = np.zeros((1024, 2048, 3), dtype=np.uint8)
    s = ArraySlide(img, num_levels=3)
    assert s.level_count == 3
    assert s.level_dimensions[0] == (2048, 1024)
    assert s.level_dimensions[1] == (512, 256)
    assert s.level_dimensions[2] == (128, 64)
    assert s.level_downsamples == (1.0, 4.0, 16.0)
    assert isinstance(s, SlideReader)


def test_read_region_level0_coordinates():
    # read_region takes level-0 coords even when reading higher levels,
    # matching the OpenSlide contract used throughout the reference
    # (utils/dataset.py:175-178).
    img = np.arange(64 * 64 * 3, dtype=np.uint64).reshape(64, 64, 3)
    img = (img % 251).astype(np.uint8)
    s = ArraySlide(img, num_levels=2)

    r0 = s.read_region((8, 4), 0, (16, 12))
    np.testing.assert_array_equal(r0, img[4:16, 8:24])

    # level-1 read: level-0 coords divided by downsample 4
    r1 = s.read_region((8, 4), 1, (4, 4))
    np.testing.assert_array_equal(r1, s.read_level(1)[1:5, 2:6])


def test_read_region_out_of_bounds_pads_white():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    s = ArraySlide(img, num_levels=1)
    r = s.read_region((-8, -8), 0, (16, 16))
    assert (r[:8, :, :] == 255).all()
    assert (r[:, :8, :] == 255).all()
    assert (r[8:, 8:, :] == 0).all()


def test_synthetic_slide_has_tissue_and_gt():
    s = SyntheticSlide(width=512, height=384, num_levels=3, seed=1)
    gt2 = s.ground_truth(2)
    img2 = s.read_level(2)
    assert gt2.shape == img2.shape[:2]
    assert gt2.max() >= 1  # at least one tumor-ish blob
    # blobs must be darker/saturated vs white background
    fg = img2[gt2 > 0]
    bg = img2[gt2 == 0]
    assert fg.mean() < bg.mean()


def test_synthetic_slide_deterministic():
    a = SyntheticSlide(width=256, height=256, seed=7).read_level(0)
    b = SyntheticSlide(width=256, height=256, seed=7).read_level(0)
    np.testing.assert_array_equal(a, b)
