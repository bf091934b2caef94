"""Hamamatsu NDPI + Philips TIFF vendor ingest (round-4 VERDICT missing #2).

Synthetic vendor-layout files (hermetic fixture writers in
wsiseg_tpu.slides.vendor) round-trip through the pure-Python readers,
route automatically via open_slide's vendor sniff, convert to .wsiraw
for the C++ fast path, and malformed variants fail with clean errors.
Raw-compression fixtures assert exact pixels; JPEG fixtures assert
uniform-region values within codec tolerance.
"""

import struct

import numpy as np
import pytest

from wsiseg_tpu.slides.j2k import convert_to_wsiraw
from wsiseg_tpu.slides.reader import open_slide
from wsiseg_tpu.slides.vendor import (NDPISlide, PhilipsTiffSlide,
                                      _split_jpeg_tables, sniff_vendor,
                                      write_ndpi, write_philips_tiff)


def _pyramid(rng, w=300, h=220):
    lv0 = rng.randint(0, 255, (h, w, 3), np.uint8)
    lv1 = lv0[::4, ::4].copy()
    return [lv0, lv1]


def _flat_pyramid(w=300, h=220):
    """Uniform-color levels: JPEG decodes them within ±3 of the source."""
    lv0 = np.full((h, w, 3), (90, 140, 200), np.uint8)
    lv1 = lv0[::4, ::4].copy()
    return [lv0, lv1]


# ---------------------------------------------------------------------------
# NDPI
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ndpi_raw(tmp_path_factory):
    rng = np.random.RandomState(1)
    levels = _pyramid(rng)
    macro = rng.randint(0, 255, (60, 90, 3), np.uint8)
    path = str(tmp_path_factory.mktemp("ndpi") / "case.ndpi")
    write_ndpi(path, levels, compression="raw", rows_per_strip=64,
               macro=macro)
    return path, levels, macro


def test_ndpi_sniff_and_route(ndpi_raw):
    path, levels, _ = ndpi_raw
    assert sniff_vendor(path) == "ndpi"
    s = open_slide(path)
    assert isinstance(s, NDPISlide)
    s.close()


def test_ndpi_raw_exact_roundtrip(ndpi_raw):
    path, levels, macro = ndpi_raw
    s = NDPISlide(path)
    assert s.level_count == 2
    assert s.level_dimensions == ((300, 220), (75, 55))
    assert s.level_downsamples == (1.0, 4.0)
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    np.testing.assert_array_equal(s.read_level(1), levels[1])
    # strip-crossing region at level 0 (rows_per_strip=64)
    np.testing.assert_array_equal(
        s.read_region((40, 50), 0, (100, 80)),
        levels[0][50:130, 40:140])
    # level-1 region in level-0 coordinates
    np.testing.assert_array_equal(
        s.read_region((40, 40), 1, (20, 15)), levels[1][10:25, 10:30])
    # out-of-bounds padding is white
    r = s.read_region((-16, -16), 0, (32, 32))
    assert (r[:16, :16] == 255).all()
    np.testing.assert_array_equal(r[16:, 16:], levels[0][:16, :16])
    # associated macro image
    assert s.associated_names == ("macro",)
    np.testing.assert_array_equal(s.associated_image("macro"), macro)
    with pytest.raises(KeyError):
        s.associated_image("map")
    s.close()


def test_ndpi_jpeg_single_strip(tmp_path):
    levels = _flat_pyramid()
    path = str(tmp_path / "flat.ndpi")
    write_ndpi(path, levels, compression="jpeg")  # one strip per image
    s = NDPISlide(path)
    lv0 = s.read_level(0)
    assert lv0.shape == (220, 300, 3)
    assert np.abs(lv0.astype(int) - [90, 140, 200]).max() <= 3
    tiles = s.read_tiles([0, 128], [0, 64], 0, 128, 64)
    assert tiles.shape == (2, 64, 128, 3)
    assert np.abs(tiles.astype(int) - [90, 140, 200]).max() <= 3
    s.close()


def test_ndpi_magnification_orders_pyramid(tmp_path):
    """Levels written smallest-first still come out width-descending."""
    rng = np.random.RandomState(2)
    levels = _pyramid(rng)
    path = str(tmp_path / "rev.ndpi")
    write_ndpi(path, [levels[1], levels[0]], magnifications=[10.0, 40.0],
               compression="raw")
    s = NDPISlide(path)
    assert s.level_dimensions == ((300, 220), (75, 55))
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    s.close()


def test_ndpi_converts_to_wsiraw(ndpi_raw, tmp_path):
    path, levels, _ = ndpi_raw
    dst = str(tmp_path / "case.wsiraw")
    convert_to_wsiraw(path, dst, max_band_bytes=64 * 300 * 3)
    s = open_slide(dst)
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    np.testing.assert_array_equal(s.read_level(1), levels[1])
    s.close()


def test_ndpi_malformed(tmp_path, ndpi_raw):
    src, _, _ = ndpi_raw
    data = open(src, "rb").read()
    # truncated mid-strip-table
    p = str(tmp_path / "trunc.ndpi")
    open(p, "wb").write(data[:200])
    with pytest.raises(ValueError):
        NDPISlide(p)
    # strip offset past EOF: NDPISlide validates lazily at decode
    rng = np.random.RandomState(3)
    p2 = str(tmp_path / "lyoff.ndpi")
    write_ndpi(p2, _pyramid(rng), compression="raw", rows_per_strip=64)
    blob = bytearray(open(p2, "rb").read())
    # find the strip-offsets array is format-internal; instead truncate the
    # file body so every out-of-header strip extent lies outside the file
    open(p2, "wb").write(bytes(blob[:-4000]))
    try:
        s = NDPISlide(p2)
    except ValueError:
        return  # truncation hit the IFD walk — equally acceptable
    with pytest.raises(ValueError, match="outside the file|truncated"):
        s.read_level(0)
    s.close()


# ---------------------------------------------------------------------------
# Philips TIFF
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def philips_raw(tmp_path_factory):
    rng = np.random.RandomState(4)
    levels = _pyramid(rng)
    path = str(tmp_path_factory.mktemp("philips") / "case.tiff")
    write_philips_tiff(path, levels, tile_size=128, compression="raw",
                       sparse=[(0, 1, 1)])
    return path, levels


def test_philips_sniff_and_route(philips_raw):
    path, _ = philips_raw
    assert sniff_vendor(path) == "philips"
    s = open_slide(path)
    assert isinstance(s, PhilipsTiffSlide)
    s.close()


def test_philips_raw_roundtrip_with_sparse(philips_raw):
    path, levels = philips_raw
    s = PhilipsTiffSlide(path)
    assert s.level_count == 2
    assert s.level_dimensions == ((300, 220), (75, 55))
    lv0 = s.read_level(0)
    # sparse tile (iy=1, ix=1) reads white; everything else exact
    expect = levels[0].copy()
    expect[128:220, 128:256] = 255
    np.testing.assert_array_equal(lv0, expect)
    np.testing.assert_array_equal(s.read_level(1), levels[1])
    # region crossing the sparse tile boundary
    r = s.read_region((100, 100), 0, (60, 60))
    np.testing.assert_array_equal(r, expect[100:160, 100:160])
    s.close()


def test_philips_jpeg_tables_roundtrip(tmp_path):
    """Split-JPEGTables decode == plain per-tile-stream decode, exactly
    (same tiles, same quality; only the segment packaging differs)."""
    rng = np.random.RandomState(9)
    levels = _pyramid(rng)
    p_tab = str(tmp_path / "tables.tiff")
    p_plain = str(tmp_path / "plain.tiff")
    write_philips_tiff(p_tab, levels, tile_size=128, compression="jpeg",
                       use_jpeg_tables=True)
    write_philips_tiff(p_plain, levels, tile_size=128, compression="jpeg",
                       use_jpeg_tables=False)
    s_tab, s_plain = PhilipsTiffSlide(p_tab), PhilipsTiffSlide(p_plain)
    for lv in range(2):
        np.testing.assert_array_equal(s_tab.read_level(lv),
                                      s_plain.read_level(lv))
    # interior of a flat region still decodes to the source color
    flat = str(tmp_path / "flat.tiff")
    write_philips_tiff(flat, _flat_pyramid(), tile_size=128,
                       compression="jpeg", use_jpeg_tables=True)
    s_flat = PhilipsTiffSlide(flat)
    r = s_flat.read_region((10, 10), 0, (100, 100))
    assert np.abs(r.astype(int) - [90, 140, 200]).max() <= 3
    for s in (s_tab, s_plain, s_flat):
        s.close()


def test_philips_deflate_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    levels = _pyramid(rng)
    path = str(tmp_path / "deflate.tiff")
    write_philips_tiff(path, levels, tile_size=128, compression="deflate")
    s = PhilipsTiffSlide(path)
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    tiles = s.read_tiles([0, 100], [0, 50], 0, 64, 64)
    np.testing.assert_array_equal(tiles[1], levels[0][50:114, 100:164])
    s.close()


def test_philips_banded_convert(tmp_path):
    rng = np.random.RandomState(6)
    levels = _pyramid(rng)
    path = str(tmp_path / "conv.tiff")
    write_philips_tiff(path, levels, tile_size=128, compression="raw")
    dst = str(tmp_path / "conv.wsiraw")
    convert_to_wsiraw(path, dst, max_band_bytes=32 * 300 * 3)
    s = open_slide(dst)
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    s.close()


def test_philips_malformed(tmp_path, philips_raw):
    src, _ = philips_raw
    data = open(src, "rb").read()
    p = str(tmp_path / "trunc.tiff")
    open(p, "wb").write(data[:150])
    with pytest.raises(ValueError):
        PhilipsTiffSlide(p)


def test_split_jpeg_tables_is_lossless():
    """tables+abbrev merge decodes identically to the original stream."""
    import io
    from PIL import Image
    rng = np.random.RandomState(7)
    tile = rng.randint(0, 255, (64, 64, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(tile).save(buf, "JPEG", quality=90)
    full = buf.getvalue()
    tables, abbrev = _split_jpeg_tables(full)
    merged = tables[:-2] + abbrev[2:]
    a = np.asarray(Image.open(io.BytesIO(full)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(merged)).convert("RGB"))
    np.testing.assert_array_equal(a, b)


def test_mirax_rejected_with_guidance(tmp_path):
    p = str(tmp_path / "slide.mrxs")
    open(p, "wb").write(b"\x00")
    with pytest.raises(ValueError, match="convert"):
        open_slide(p)


def test_plain_tiff_still_routes_native(tmp_path):
    """A plain tiled TIFF (no vendor markers) keeps the C++ fast path."""
    from wsiseg_tpu.slides.native import NativeSlide, write_tiled_pyramid
    rng = np.random.RandomState(8)
    levels = _pyramid(rng)
    path = str(tmp_path / "plain.tif")
    write_tiled_pyramid(path, levels, tile_size=128)
    assert sniff_vendor(path) is None
    s = open_slide(path)
    assert isinstance(s, NativeSlide)
    np.testing.assert_array_equal(s.read_level(0), levels[0])
    s.close()


def test_corrupt_text_tag_offset_does_not_abort_parse(tmp_path):
    """A bogus out-of-line ASCII tag offset (tags the pre-vendor parser
    ignored entirely) must drop the tag, not abort routing."""
    rng = np.random.RandomState(10)
    levels = _pyramid(rng)
    p = str(tmp_path / "badsoft.tiff")
    write_philips_tiff(p, levels, tile_size=128, compression="raw")
    blob = bytearray(open(p, "rb").read())
    # IFD entries: tag 305 (Software), type 2, count 16 — one per level
    # directory; smash EVERY occurrence's offset
    pat = struct.pack("<HHI", 305, 2, 16)
    i, n_smashed = 0, 0
    while True:
        i = blob.find(pat, i)
        if i < 0:
            break
        blob[i + 8:i + 12] = struct.pack("<I", 0xFFFFFFF0)
        i += len(pat)
        n_smashed += 1
    assert n_smashed == 2
    open(p, "wb").write(bytes(blob))
    from wsiseg_tpu.slides.vendor import classify_tiff
    # Software dropped -> not Philips; parse survives -> plain TIFF route
    assert classify_tiff(p) is None
    from wsiseg_tpu.slides.native import NativeSlide
    s = open_slide(p)
    assert isinstance(s, NativeSlide)
    s.close()


def test_ndpi_malformed_macro_raises_clean(ndpi_raw):
    path, _, _ = ndpi_raw
    s = NDPISlide(path)
    from wsiseg_tpu.slides import vendor as V
    s._associated["macro"][V._TAG_ROWS_PER_STRIP] = [0]
    with pytest.raises(ValueError, match="RowsPerStrip"):
        s.associated_image("macro")
    s.close()


def test_ndpi_over_4gib_classic_refused(tmp_path):
    rng = np.random.RandomState(11)
    p = str(tmp_path / "big.ndpi")
    write_ndpi(p, _pyramid(rng), compression="raw")
    import os
    os.truncate(p, (1 << 32) + 4096)  # sparse; offsets would wrap
    with pytest.raises(ValueError, match="4 GiB"):
        NDPISlide(p)


def test_ndpi_strip_cache_lru_refresh(tmp_path):
    rng = np.random.RandomState(12)
    l0 = rng.randint(0, 255, (64, 310, 3), np.uint8)
    p = str(tmp_path / "lru.ndpi")
    write_ndpi(p, [l0], compression="raw", rows_per_strip=16)
    one = 16 * 310 * 3
    s = NDPISlide(p, cache_bytes=2 * one)
    s._strip(0, 0)
    s._strip(0, 1)           # cache [(0,0), (0,1)]
    s._strip(0, 0)           # hit refreshes recency -> [(0,1), (0,0)]
    s._strip(0, 2)           # evicts LRU (0,1), not (0,0)
    assert (0, 0) in s._cache and (0, 1) not in s._cache
    assert s._cache_bytes == 2 * one
    s.close()


def test_host_step_keys_range_guard():
    from wsiseg_tpu.train.loop import host_step_keys
    with pytest.raises(ValueError, match="out of range"):
        host_step_keys(0, 0, 1 << 20)
    with pytest.raises(ValueError, match="out of range"):
        host_step_keys(1 << 24, 0, 0)


def test_slide_collection_discovers_all_vendor_extensions(tmp_path):
    """Directory-mode SlideCollection (the eval CLI's discovery) must see
    every extension open_slide routes: svs, tif, tiff, ndpi, wsiraw, npy,
    plus Case*/ subdirs — not just the reference's .svs."""
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.wsi_tiles import SlideCollection
    from wsiseg_tpu.slides import SyntheticSlide
    from wsiseg_tpu.slides.native import write_raw_pyramid, write_tiled_pyramid

    # level 2 must fit ≥1 tile: 2048/4² = 512×384 at scan_level 2
    syn = SyntheticSlide(width=2048, height=1536, num_levels=3, seed=5)
    levels = [syn.read_level(k) for k in range(3)]
    d = tmp_path / "slides"
    (d / "Case1").mkdir(parents=True)
    write_tiled_pyramid(str(d / "Case1" / "a.svs"), levels, tile_size=128)
    write_tiled_pyramid(str(d / "b.tif"), levels, tile_size=128)
    write_philips_tiff(str(d / "c.tiff"), levels, tile_size=128,
                       compression="raw")
    write_ndpi(str(d / "d.ndpi"), levels, compression="raw",
               rows_per_strip=64)
    write_raw_pyramid(str(d / "e.wsiraw"), levels)
    # .npy loads as an ArraySlide that builds its own 3-level pyramid, so
    # give it level 0 (its scan level then matches the others')
    np.save(str(d / "f.npy"), levels[0])

    cfg = default_config(tile_w=64, tile_h=64, tile_stride_w=64,
                         tile_stride_h=64, compute_dtype="float32",
                         wsi_mask_pth=str(tmp_path / "masks"))
    coll = SlideCollection(str(d), cfg)
    assert sorted(coll.plans) == ["a.svs", "b.tif", "c.tiff", "d.ndpi",
                                  "e.wsiraw", "f.npy"]
    # pyramid-backed plans agree on geometry (npy is single-level)
    grids = {n: len(p.grid) for n, p in coll.plans.items()}
    assert grids["d.ndpi"] == grids["a.svs"] == grids["c.tiff"] > 0


def test_glob_slides_single_source_of_truth(tmp_path):
    from wsiseg_tpu.slides.reader import glob_slides
    d = tmp_path / "s"
    (d / "Case9").mkdir(parents=True)
    for name in ("x.svs", "y.tiff", "z.ndpi", "w.wsiraw", "v.npy", "u.txt"):
        (d / name).write_bytes(b"")
    (d / "Case9" / "c.svs").write_bytes(b"")
    got = [p.split("/")[-1] for p in glob_slides(str(d), case_dirs=True)]
    assert sorted(got) == ["c.svs", "v.npy", "w.wsiraw", "x.svs", "y.tiff",
                           "z.ndpi"]
    no_npy = glob_slides(str(d), include_npy=False)
    assert not any(p.endswith(".npy") for p in no_npy)
    # no Case* scan unless asked
    assert not any("Case9" in p for p in glob_slides(str(d)))


# ---------------------------------------------------------------------------
# restart-banded JPEG decode (slides/jpegband.py) — real-NDPI layout:
# one giant JPEG strip per level, DRI restart markers at MCU-row bounds
# ---------------------------------------------------------------------------


def test_ndpi_restart_banded_reads_bit_identical(tmp_path):
    """Banded reads of a single-JPEG-strip NDPI equal the whole-image
    decode BIT-IDENTICALLY (chroma-upsampling margin handled), and only
    the touched rows are ever decoded."""
    import io
    from PIL import Image
    from wsiseg_tpu.slides import jpegband

    rng = np.random.RandomState(20)
    l0 = rng.randint(0, 255, (317, 451, 3), np.uint8)
    p = str(tmp_path / "band.ndpi")
    write_ndpi(p, [l0], compression="jpeg", restart_rows=2)

    # whole-decode oracle straight from the embedded stream
    s = NDPISlide(p)
    assert s._band_structure(0) is not None, "fixture must be bandable"
    st = s._band_structure(0)[0]
    off = s._levels[0][273][0]
    cnt = s._levels[0][279][0]
    blob = open(p, "rb").read()[off:off + cnt]
    oracle = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))

    decoded_spans = []
    real_decode = jpegband.decode_rows

    def spy(ra, stc, starts, eoi, y0, y1):
        decoded_spans.append((y0, y1))
        return real_decode(ra, stc, starts, eoi, y0, y1)

    jpegband.decode_rows = spy
    try:
        np.testing.assert_array_equal(
            s.read_region((40, 50), 0, (100, 80)), oracle[50:130, 40:140])
        np.testing.assert_array_equal(
            s.read_region((0, 300), 0, (451, 40))[:17], oracle[300:317])
        tiles = s.read_tiles([0, 128], [64, 64], 0, 128, 64)
        np.testing.assert_array_equal(tiles[0], oracle[64:128, 0:128])
        np.testing.assert_array_equal(tiles[1], oracle[64:128, 128:256])
    finally:
        jpegband.decode_rows = real_decode
    # bounded: no decode ever spanned the whole 317-row strip (spans are
    # segment-aligned: ≤ request + 2·rows_per_segment − 1 = 80 + 63)
    assert decoded_spans and all(y1 - y0 <= 160 for (y0, y1) in decoded_spans), \
        decoded_spans
    # the tile pair at the same rows hit the band cache: one decode
    assert len([sp for sp in decoded_spans if sp == (64, 128)]) == 1
    # full-level read still matches
    np.testing.assert_array_equal(s.read_level(0), oracle)
    s.close()


def test_ndpi_jpeg_without_restarts_falls_back(tmp_path):
    """No DRI → _band_structure None → whole-strip decode path."""
    levels = _flat_pyramid()
    p = str(tmp_path / "norst.ndpi")
    write_ndpi(p, levels, compression="jpeg")  # no restart markers
    s = NDPISlide(p)
    assert s._band_structure(0) is None
    r = s.read_region((10, 10), 0, (64, 64))
    assert np.abs(r.astype(int) - [90, 140, 200]).max() <= 3
    s.close()


def test_ndpi_banded_convert_to_wsiraw(tmp_path):
    """Banded NDPI → banded wsiraw conversion: exact vs the whole-decode
    oracle (the production ingest path for real NDPI files)."""
    import io
    from PIL import Image
    rng = np.random.RandomState(21)
    l0 = rng.randint(0, 255, (256, 320, 3), np.uint8)
    p = str(tmp_path / "conv.ndpi")
    write_ndpi(p, [l0], compression="jpeg", restart_rows=1, quality=92)
    s = NDPISlide(p)
    off = s._levels[0][273][0]
    cnt = s._levels[0][279][0]
    blob = open(p, "rb").read()[off:off + cnt]
    oracle = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    s.close()
    dst = str(tmp_path / "conv.wsiraw")
    convert_to_wsiraw(p, dst, max_band_bytes=32 * 320 * 3)
    out = open_slide(dst)
    np.testing.assert_array_equal(out.read_level(0), oracle)
    out.close()


def test_ndpi_banded_corrupt_segment_raises_clean(tmp_path):
    """Garbage inside a restart segment surfaces as the module's clean
    ValueError (not a bare PIL exception) and names the row span."""
    rng = np.random.RandomState(22)
    l0 = rng.randint(0, 255, (256, 320, 3), np.uint8)
    p = str(tmp_path / "corrupt.ndpi")
    write_ndpi(p, [l0], compression="jpeg", restart_rows=1, quality=92)
    s = NDPISlide(p)
    st, starts, eoi, ra = s._band_structure(0)
    assert len(starts) > 4
    off = s._levels[0][273][0]
    blob = bytearray(open(p, "rb").read())
    # zero 64 bytes inside the 3rd restart segment's entropy data
    seg = off + starts[2] + 8
    blob[seg:seg + 64] = b"\xff\x00" * 32  # stuffed-FF soup -> decode error
    open(p, "wb").write(bytes(blob))
    s.close()
    s2 = NDPISlide(p)
    rps = st.rows_per_segment_px
    try:
        band = s2.read_region((0, 2 * rps), 0, (320, rps))
        # some libjpeg builds resync past corruption instead of failing:
        # then output must still be the right shape (white/garbage rows,
        # never a crash)
        assert band.shape == (rps, 320, 3)
    except ValueError as e:
        assert "banded JPEG decode" in str(e)
    s2.close()


def test_ndpi_jpegtables_strip_not_banded(tmp_path):
    """Abbreviated JPEG strips (split JPEGTables tag) must NOT band-decode
    (the synthetic band JPEG would lack DQT/DHT) — they keep the
    whole-strip path, which merges the tables and stays correct."""
    from wsiseg_tpu.slides import vendor as V
    import io
    from PIL import Image
    rng = np.random.RandomState(30)
    img = rng.randint(0, 255, (64, 96, 3), np.uint8)
    full = V._encode_jpeg(img, 90, restart_rows=1)  # bandable if not split
    tables, abbrev = _split_jpeg_tables(full)
    b = V._TiffBuilder()
    off = b.blob(abbrev)
    b.add_ifd([
        (V._TAG_WIDTH, 4, 96), (V._TAG_HEIGHT, 4, 64),
        (V._TAG_BITS, 3, [8, 8, 8]),
        (V._TAG_COMPRESSION, 3, V._COMP_JPEG),
        (V._TAG_PHOTOMETRIC, 3, 6), (V._TAG_SAMPLES, 3, 3),
        (V._TAG_ROWS_PER_STRIP, 4, 64),
        (V._TAG_STRIP_OFFSETS, 4, [off]),
        (V._TAG_STRIP_COUNTS, 4, [len(abbrev)]),
        (V._TAG_JPEG_TABLES, 7, tables),
        (V._TAG_NDPI_MARKER, 4, 1),
        (V._TAG_NDPI_SOURCELENS, 11, [40.0]),
    ])
    p = str(tmp_path / "abbrev.ndpi")
    b.save(p)
    s = NDPISlide(p)
    assert s._band_structure(0) is None
    oracle = np.asarray(Image.open(io.BytesIO(full)).convert("RGB"))
    np.testing.assert_array_equal(s.read_level(0), oracle)
    s.close()


def test_parse_structure_malformed_sof_returns_none():
    from wsiseg_tpu.slides.jpegband import parse_structure
    # SOF segment shorter than its component table
    assert parse_structure(b"\xff\xd8\xff\xc0\x00\x04\x08\x00") is None
    assert parse_structure(b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x40\x00"
                           b"\x60\x03") is None  # ncomp=3, no comp bytes
    assert parse_structure(b"not a jpeg") is None
