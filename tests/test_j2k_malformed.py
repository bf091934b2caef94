"""Malformed/hostile J2K SVS input (round-4 VERDICT weak #5).

slides/j2k.py parses untrusted scanner output; every corruption mode must
surface as a clean ValueError (never a bare struct.error / KeyError /
IndexError, never a hang). Fixtures are byte-level corruptions of a valid
synthetic Aperio-J2K file, patched through the real TIFF structure.
"""

import struct

import numpy as np
import pytest

from wsiseg_tpu.slides.j2k import (APERIO_J2K_RGB, J2KTiledSlide,
                                   is_aperio_j2k, sniff_tiff_compressions,
                                   write_j2k_tiled_tiff)

_TAG_WIDTH, _TAG_TILE_W = 256, 322
_TAG_TILE_OFFSETS, _TAG_TILE_COUNTS = 324, 325


def _valid_bytes(tmp_path, name="good.svs", w=300, h=220):
    rng = np.random.RandomState(0)
    lv0 = rng.randint(0, 255, (h, w, 3), np.uint8)
    path = str(tmp_path / name)
    write_j2k_tiled_tiff(path, [lv0], tile_size=128,
                         compression=APERIO_J2K_RGB)
    with open(path, "rb") as f:
        return path, bytearray(f.read())


def _patch_tag(buf: bytearray, tag: int, *, value=None, rename_to=None):
    """Patch one IFD0 entry in the classic little-endian fixture layout
    (12-byte entries; value field = bytes 8:12 — inline value or the
    out-of-line array offset)."""
    (ifd0,) = struct.unpack_from("<I", buf, 4)
    (count,) = struct.unpack_from("<H", buf, ifd0)
    for i in range(count):
        e = ifd0 + 2 + 12 * i
        (t,) = struct.unpack_from("<H", buf, e)
        if t == tag:
            if rename_to is not None:
                struct.pack_into("<H", buf, e, rename_to)
            if value is not None:
                struct.pack_into("<I", buf, e + 8, value)
            return e
    raise AssertionError(f"tag {tag} not in fixture IFD")


def _write(tmp_path, name, buf):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(bytes(buf))
    return p


def test_not_a_tiff(tmp_path):
    p = _write(tmp_path, "junk.svs", b"\x89PNG not a slide at all" * 4)
    with pytest.raises(ValueError, match="not a TIFF"):
        J2KTiledSlide(p)
    # the open_slide sniffers must stay silent on garbage, not raise
    assert sniff_tiff_compressions(p) == ()
    assert not is_aperio_j2k(p)


def test_truncated_header(tmp_path):
    p = _write(tmp_path, "trunc_hdr.svs", b"II\x2a\x00")
    with pytest.raises(ValueError, match="not a TIFF"):
        J2KTiledSlide(p)


def test_truncated_ifd_table(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    (ifd0,) = struct.unpack_from("<I", buf, 4)
    # keep the entry count but cut the file mid-entry-table
    p = _write(tmp_path, "trunc_ifd.svs", buf[:ifd0 + 2 + 5])
    with pytest.raises(ValueError, match="truncated TIFF"):
        J2KTiledSlide(p)
    assert sniff_tiff_compressions(p) == ()


def test_implausible_ifd_entry_count(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    (ifd0,) = struct.unpack_from("<I", buf, 4)
    struct.pack_into("<H", buf, ifd0, 0xFFFF)
    p = _write(tmp_path, "huge_count.svs", buf)
    with pytest.raises(ValueError, match="IFD entry count"):
        J2KTiledSlide(p)


def test_tile_offset_past_eof(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    # 300x220 @128² = 3x2 tiles → offsets live out-of-line; point the
    # array's FIRST offset past EOF (the array position itself is the
    # entry's value field)
    (ifd0,) = struct.unpack_from("<I", buf, 4)
    e = _patch_tag(buf, _TAG_TILE_OFFSETS)
    (arr_off,) = struct.unpack_from("<I", buf, e + 8)
    struct.pack_into("<I", buf, arr_off, len(buf) + 4096)
    p = _write(tmp_path, "bad_off.svs", buf)
    s = J2KTiledSlide(p)  # structurally fine — fails on the tile read
    with pytest.raises(ValueError, match="outside"):
        s.read_region((0, 0), 0, (64, 64))
    s.close()


def test_zero_tile_bytecount(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    e = _patch_tag(buf, _TAG_TILE_COUNTS)
    (arr_off,) = struct.unpack_from("<I", buf, e + 8)
    struct.pack_into("<I", buf, arr_off, 0)
    p = _write(tmp_path, "zero_cnt.svs", buf)
    s = J2KTiledSlide(p)
    with pytest.raises(ValueError, match="outside"):
        s.read_region((0, 0), 0, (64, 64))
    s.close()


def test_corrupt_codestream(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    e = _patch_tag(buf, _TAG_TILE_OFFSETS)
    (arr_off,) = struct.unpack_from("<I", buf, e + 8)
    (t0_off,) = struct.unpack_from("<I", buf, arr_off)
    buf[t0_off:t0_off + 64] = b"\xde\xad" * 32  # stomp the first codestream
    p = _write(tmp_path, "bad_stream.svs", buf)
    s = J2KTiledSlide(p)
    with pytest.raises(ValueError, match="undecodable"):
        s.read_region((0, 0), 0, (64, 64))
    s.close()


def test_missing_width_tag(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    _patch_tag(buf, _TAG_WIDTH, rename_to=60000)  # unknown private tag
    p = _write(tmp_path, "no_width.svs", buf)
    with pytest.raises(ValueError, match="missing ImageWidth"):
        J2KTiledSlide(p)


def test_zero_tile_dimensions(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    _patch_tag(buf, _TAG_TILE_W, value=0)
    p = _write(tmp_path, "zero_tile.svs", buf)
    with pytest.raises(ValueError, match="non-positive"):
        J2KTiledSlide(p)


def test_offsets_array_shorter_than_grid(tmp_path):
    _, buf = _valid_bytes(tmp_path)
    # lie about the image width: 10x the tiles, same 6-entry offset array
    _patch_tag(buf, _TAG_WIDTH, value=3000)
    p = _write(tmp_path, "short_offsets.svs", buf)
    with pytest.raises(ValueError, match="offsets"):
        J2KTiledSlide(p)


def test_valid_fixture_still_opens(tmp_path):
    """The corruption helpers start from a file the hardened reader accepts."""
    path, _ = _valid_bytes(tmp_path)
    s = J2KTiledSlide(path)
    assert s.level_count == 1
    r = s.read_region((0, 0), 0, (32, 32))
    assert r.shape == (32, 32, 3)
    s.close()
