"""COG sink: structural validity, round-trip, overview pyramid,
cloud-optimized layout (IFDs before tile data), georeferencing tags."""

import struct

import numpy as np
import pytest

from datacube_core_spark.geom.affine import Affine
from datacube_core_spark.geom.grid import GeoBox
from datacube_core_spark.sources.cog import (
    T_GEOKEYS,
    T_MODELPIXELSCALE,
    T_MODELTIEPOINT,
    T_NEWSUBFILETYPE,
    T_TILEOFFSETS,
    read_cog,
    to_cog,
    write_cog,
)


def _gbox(w, h, res=0.25, left=10.0, top=50.0, crs="EPSG:4326"):
    return GeoBox(w, h, Affine(res, 0.0, left, 0.0, -res, top), crs)


def test_roundtrip_and_overviews():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4000, size=(700, 900)).astype("uint16")
    blob = to_cog(a, _gbox(900, 700), tile=256)
    levels = read_cog(blob)
    # full res + pyramid down to <= one tile: 700x900 -> 350x450 -> 175x225
    assert len(levels) == 3
    np.testing.assert_array_equal(levels[0]["image"], a)
    assert levels[1]["image"].shape == (350, 450)
    assert levels[2]["image"].shape == (175, 225)
    # overview content = factor-2 box average
    exp1 = a[:700, :900].reshape(350, 2, 450, 2).astype("float64").mean(axis=(1, 3))
    np.testing.assert_array_equal(levels[1]["image"], np.rint(exp1).astype("uint16"))
    # overviews flagged as reduced-resolution subfiles
    assert T_NEWSUBFILETYPE not in levels[0]["tags"]
    assert levels[1]["tags"][T_NEWSUBFILETYPE] == [1]


def test_cloud_optimized_layout():
    a = np.arange(512 * 512, dtype="int32").reshape(512, 512)
    blob = to_cog(a, _gbox(512, 512), tile=256)
    levels = read_cog(blob)
    max_ifd_end = max(lv["ifd_offset"] for lv in levels) + 4096  # generous bound
    min_tile_offset = min(min(lv["tags"][T_TILEOFFSETS]) for lv in levels)
    # every IFD header precedes all tile data — the COG layout rule
    assert all(lv["ifd_offset"] < min_tile_offset for lv in levels)
    assert min_tile_offset < len(blob)


def test_georeferencing_tags():
    a = np.zeros((100, 200), dtype="float32")
    blob = to_cog(a, _gbox(200, 100, res=0.5, left=-20.0, top=35.0), tile=128, nodata=-1.0)
    lv0 = read_cog(blob)[0]["tags"]
    assert lv0[T_MODELPIXELSCALE] == [0.5, 0.5, 0.0]
    assert lv0[T_MODELTIEPOINT] == [0.0, 0.0, 0.0, -20.0, 35.0, 0.0]
    keys = lv0[T_GEOKEYS]
    # 3 geokeys; geographic model; EPSG 4326 in GeographicTypeGeoKey
    assert keys[3] == 3 and (1024, 0, 1, 2) == tuple(keys[4:8])
    assert keys[12:16] == [2048, 0, 1, 4326]

    blob_m = to_cog(a, _gbox(200, 100, crs="EPSG:3857"), tile=128)
    keys_m = read_cog(blob_m)[0]["tags"][T_GEOKEYS]
    assert keys_m[12:16] == [3072, 0, 1, 3857]  # ProjectedCSType


def test_float_and_signed_dtypes():
    for dt in ("float64", "int16", "uint8"):
        a = (np.arange(80 * 60).reshape(60, 80) % 250).astype(dt)
        levels = read_cog(to_cog(a, _gbox(80, 60), tile=64))
        np.testing.assert_array_equal(levels[0]["image"], a)
        assert levels[0]["image"].dtype == a.dtype


def test_bad_inputs():
    a = np.zeros((10, 10), dtype="uint8")
    with pytest.raises(ValueError, match="shape"):
        to_cog(a, _gbox(20, 20))
    with pytest.raises(ValueError, match="EPSG"):
        to_cog(a, _gbox(10, 10, crs="WKT:something"))
    with pytest.raises(ValueError, match="2-d"):
        to_cog(np.zeros((2, 3, 4), dtype="uint8"), _gbox(4, 3))
    # write_cog to file + :mem: parity
    import tempfile, os
    blob = write_cog(a, _gbox(10, 10), ":mem:")
    with tempfile.TemporaryDirectory() as d:
        p = write_cog(a, _gbox(10, 10), os.path.join(d, "x.tif"))
        assert open(p, "rb").read() == blob


# ---------------------------------------------------------------------------
# golden-byte validation (VERDICT r2 #8): the structural reader above is
# self-referential, so these checks parse the written bytes with an
# INDEPENDENT mini-parser written straight from the TIFF 6.0 spec (no
# sources/cog.py read path), plus a frozen byte hash so any layout drift
# is caught even where the parser is lenient.
# ---------------------------------------------------------------------------

GOLDEN_MD5 = "a755daa4957aec09ba0ad0f495a667ff"
GOLDEN_LEN = 10732
GOLDEN_HEAD64 = (
    "49492a00080000000f00000104000100000040000000010104000100000030"
    "000000020103000100000010000000030103000100000001000000060103000100"
)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}


def _golden_blob():
    a = (np.arange(64 * 48, dtype=np.uint16) % 251).reshape(48, 64)
    gbox = _gbox(64, 48)
    return to_cog(a, gbox, tile=32)


def _walk_ifds_spec(blob):
    """TIFF 6.0 spec walk: little-endian header, chained IFDs, 12-byte
    entries (tag u16, type u16, count u32, value/offset u32)."""
    assert blob[:4] == b"II*\x00", "little-endian classic TIFF magic"
    (first,) = struct.unpack_from("<I", blob, 4)
    ifds, off = [], first
    while off:
        (n,) = struct.unpack_from("<H", blob, off)
        entries = []
        for i in range(n):
            tag, typ, cnt, val = struct.unpack_from("<HHII", blob, off + 2 + 12 * i)
            entries.append((tag, typ, cnt, val))
        (nxt,) = struct.unpack_from("<I", blob, off + 2 + 12 * n)
        ifds.append((off, entries))
        off = nxt
    return ifds


def test_cog_golden_bytes():
    blob = _golden_blob()
    import hashlib

    assert len(blob) == GOLDEN_LEN
    assert blob[:64].hex() == GOLDEN_HEAD64
    assert hashlib.md5(blob).hexdigest() == GOLDEN_MD5


def test_cog_spec_parser_structure():
    blob = _golden_blob()
    ifds = _walk_ifds_spec(blob)
    # 48x64 @ tile 32 -> full res + one 24x32 overview
    assert len(ifds) == 2

    end_of_ifd_region = 0
    for off, entries in ifds:
        tags = [t for t, *_ in entries]
        # TIFF 6.0: entries MUST be sorted ascending by tag
        assert tags == sorted(tags), f"IFD@{off}: tags not ascending: {tags}"
        assert len(set(tags)) == len(tags), "duplicate tags"
        by_tag = {t: (typ, cnt, val) for t, typ, cnt, val in entries}
        # required tile-organized baseline tags
        for req in (256, 257, 258, 259, 262, 277, 322, 323, 324, 325):
            assert req in by_tag, f"IFD@{off} missing tag {req}"
        assert by_tag[259][2] == 1, "Compression=1 (none)"
        assert by_tag[322][2] == 32 and by_tag[323][2] == 32  # tile w/h
        # every out-of-line value offset is word-aligned and in-bounds
        for tag, typ, cnt, val in entries:
            sz = _TYPE_SIZE[typ] * cnt
            if sz > 4:
                assert val % 2 == 0 and val + sz <= len(blob), f"tag {tag} value oob"
        end_of_ifd_region = max(end_of_ifd_region, off + 2 + 12 * len(entries) + 4)

    # cloud-optimized: ALL tile data sits after every IFD
    for off, entries in ifds:
        by_tag = {t: (typ, cnt, val) for t, typ, cnt, val in entries}
        typ, cnt, val = by_tag[324]  # TileOffsets
        if _TYPE_SIZE[typ] * cnt > 4:
            tile_offsets = struct.unpack_from(f"<{cnt}I", blob, val)
        else:
            tile_offsets = (val,)
        counts_typ, counts_cnt, counts_val = by_tag[325]
        if _TYPE_SIZE[counts_typ] * counts_cnt > 4:
            tile_counts = struct.unpack_from(f"<{counts_cnt}I", blob, counts_val)
        else:
            tile_counts = (counts_val,)
        for to, tc in zip(tile_offsets, tile_counts):
            assert to >= end_of_ifd_region, "tile data before IFDs: not cloud-optimized"
            assert to + tc <= len(blob)

    # geotags present on the full-res IFD
    full = {t: (typ, cnt, val) for t, typ, cnt, val in ifds[0][1]}
    assert T_MODELPIXELSCALE in full and T_MODELTIEPOINT in full and T_GEOKEYS in full
    # overview flagged reduced-resolution via NewSubfileType=1
    ov = {t: (typ, cnt, val) for t, typ, cnt, val in ifds[1][1]}
    assert ov[T_NEWSUBFILETYPE][2] == 1
