"""First-party C++ tile decoder (native/wsitile via ctypes)."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.skipif(
    os.environ.get("WSISEG_SKIP_NATIVE") == "1",
    reason="native build disabled")


@pytest.fixture(scope="module")
def lib():
    from wsiseg_tpu.slides.native import load_library
    return load_library()


@pytest.fixture(scope="module")
def pyramid_arrays():
    rng = np.random.RandomState(0)
    lv0 = rng.randint(0, 255, (512, 768, 3), np.uint8)
    lv1 = lv0[::4, ::4].copy()
    lv2 = lv1[::4, ::4].copy()
    return [lv0, lv1, lv2]


@pytest.fixture(scope="module")
def raw_slide(lib, pyramid_arrays, tmp_path_factory):
    from wsiseg_tpu.slides.native import NativeSlide, write_raw_pyramid
    pth = str(tmp_path_factory.mktemp("raw") / "s.wsiraw")
    write_raw_pyramid(pth, pyramid_arrays)
    return NativeSlide(pth)


def test_raw_pyramid_geometry(raw_slide, pyramid_arrays):
    assert raw_slide.level_count == 3
    assert raw_slide.level_dimensions == ((768, 512), (192, 128), (48, 32))
    np.testing.assert_allclose(raw_slide.level_downsamples, (1.0, 4.0, 16.0))


def test_raw_read_level(raw_slide, pyramid_arrays):
    for k in range(3):
        np.testing.assert_array_equal(raw_slide.read_level(k),
                                      pyramid_arrays[k])


def test_raw_read_region_level0_coords(raw_slide, pyramid_arrays):
    # read_region takes level-0 coordinates (OpenSlide convention)
    out = raw_slide.read_region((64, 32), 1, (16, 16))
    np.testing.assert_array_equal(out, pyramid_arrays[1][8:24, 16:32])


def test_raw_read_region_oob_padding(raw_slide):
    out = raw_slide.read_region((-64, -64), 0, (32, 32))
    assert (out[:16, :16] == 255).all()


def test_raw_read_tiles_batched(raw_slide, pyramid_arrays):
    xs = [0, 16, 100, 180]
    ys = [0, 8, 50, 120]
    tiles = raw_slide.read_tiles(xs, ys, level=1, tile_w=24, tile_h=24,
                                 nthreads=4)
    assert tiles.shape == (4, 24, 24, 3)
    lv1 = pyramid_arrays[1]
    for i, (x, y) in enumerate(zip(xs, ys)):
        expect = np.full((24, 24, 3), 255, np.uint8)
        sy1, sx1 = min(lv1.shape[0], y + 24), min(lv1.shape[1], x + 24)
        expect[: sy1 - y, : sx1 - x] = lv1[y:sy1, x:sx1]
        np.testing.assert_array_equal(tiles[i], expect)


@pytest.fixture(scope="module")
def tiff_slide(tmp_path_factory, pyramid_arrays):
    """Multi-page (stripped) TIFF via PIL; decoded by our libtiff backend."""
    from wsiseg_tpu.slides.native import NativeSlide
    pth = str(tmp_path_factory.mktemp("tif") / "s.tif")
    imgs = [Image.fromarray(a) for a in pyramid_arrays]
    imgs[0].save(pth, save_all=True, append_images=imgs[1:])
    return NativeSlide(pth)


def test_tiff_geometry(tiff_slide):
    assert tiff_slide.level_count == 3
    assert tiff_slide.level_dimensions[0] == (768, 512)
    assert tiff_slide.level_downsamples[1] == 4.0


def test_tiff_read_matches_arrays(tiff_slide, pyramid_arrays):
    np.testing.assert_array_equal(tiff_slide.read_level(2),
                                  pyramid_arrays[2])
    out = tiff_slide.read_region((128, 64), 0, (64, 48))
    np.testing.assert_array_equal(out, pyramid_arrays[0][64:112, 128:192])


def test_tiff_read_tiles(tiff_slide, pyramid_arrays):
    tiles = tiff_slide.read_tiles([10, 30], [5, 40], level=1,
                                  tile_w=32, tile_h=32, nthreads=2)
    lv1 = pyramid_arrays[1]
    np.testing.assert_array_equal(tiles[0], lv1[5:37, 10:42])


def test_open_slide_routes_tiff(tmp_path, pyramid_arrays):
    from wsiseg_tpu.slides.native import NativeSlide
    from wsiseg_tpu.slides.reader import open_slide
    pth = str(tmp_path / "r.tif")
    imgs = [Image.fromarray(a) for a in pyramid_arrays]
    imgs[0].save(pth, save_all=True, append_images=imgs[1:])
    slide = open_slide(pth)
    assert isinstance(slide, NativeSlide)


def test_tiled_pyramid_partial_edge_tiles(tmp_path):
    """Regression: partial bottom/right edge tiles of a TILED TIFF must
    decode correctly (RGBA tile rows are bottom-up; the valid rows of a
    short edge tile land at offset 0 after flipping)."""
    from wsiseg_tpu.slides.native import NativeSlide, write_tiled_pyramid

    H, W = 200, 300    # not multiples of the 128 tile size
    iy, ix = np.mgrid[0:H, 0:W]
    lv0 = np.stack([iy % 251, ix % 251, (iy + ix) % 251], -1).astype(np.uint8)
    lv1 = lv0[::4, ::4].copy()
    pth = str(tmp_path / "t.tif")
    write_tiled_pyramid(pth, [lv0, lv1], tile_size=128)

    s = NativeSlide(pth)
    assert s.level_count == 2
    np.testing.assert_array_equal(s.read_level(0), lv0)
    np.testing.assert_array_equal(s.read_level(1), lv1)
    # region crossing the partial bottom tile + out-of-bounds padding
    r = s.read_region((100, 150), 0, (64, 64))
    np.testing.assert_array_equal(r[:50], lv0[150:200, 100:164])
    assert (r[50:] == 255).all()
    # batched threaded read across the edge
    tiles = s.read_tiles([250, 0], [150, 0], level=0, tile_w=64, tile_h=64,
                         nthreads=2)
    expect = np.full((64, 64, 3), 255, np.uint8)
    expect[:50, :50] = lv0[150:200, 250:300]
    np.testing.assert_array_equal(tiles[0], expect)
