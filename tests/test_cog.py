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
