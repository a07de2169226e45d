"""Tests for gbox ops, GeoboxTiles, and math/ROI utilities — expected
values mirror the reference's doctests and test_gbox_ops.py semantics."""

import numpy as np
import pytest

from datacube_core_spark.geom import Affine, BoundingBox, GeoBox, box_ring
from datacube_core_spark.geom.gbox import (
    GeoboxTiles,
    flipx,
    flipy,
    gbox_getitem,
    pad,
    pad_wh,
    translate_pix,
    zoom_out,
    zoom_to,
)
from datacube_core_spark.geom.mathx import (
    affine_from_axis,
    align_up,
    data_resolution_and_offset,
    invalid_mask,
    is_almost_int,
    iter_slices,
    maybe_int,
    roi_intersect,
    roi_normalise,
    roi_shape,
    snap_scale,
    valid_mask,
)


def _gbox():
    # 100x200 px at 0.1 res, top-left (10, 20), y negative
    return GeoBox(200, 100, Affine.translation(10, 20) * Affine.scale(0.1, -0.1), "EPSG:4326")


def test_gbox_ops_preserve_extent():
    gb = _gbox()
    for op in (flipy, flipx):
        g2 = op(gb)
        assert g2.shape == gb.shape
        e1, e2 = gb.extent_bbox, g2.extent_bbox
        assert e1 == e2

    g3 = pad(gb, 5)
    assert g3.shape == (110, 210)
    assert g3.extent_bbox.left == pytest.approx(gb.extent_bbox.left - 0.5)

    g4 = pad_wh(gb, 16)
    assert g4.width == align_up(200, 16) and g4.height == align_up(100, 16)

    g5 = zoom_out(gb, 2)
    assert g5.shape == (50, 100)
    assert g5.extent_bbox == gb.extent_bbox

    g6 = zoom_to(gb, (25, 50))
    assert g6.shape == (25, 50)
    assert g6.extent_bbox == gb.extent_bbox

    g7 = translate_pix(gb, 10, 5)
    x0, y0 = g7.affine * (0, 0)
    xr, yr = gb.affine * (10, 5)
    assert (x0, y0) == (xr, yr)


def test_gbox_getitem():
    gb = _gbox()
    sub = gbox_getitem(gb, (slice(10, 30), slice(40, 100)))
    assert sub.shape == (20, 60)
    x0, y0 = sub.affine * (0, 0)
    assert (x0, y0) == gb.affine * (40, 10)


def test_geobox_tiles_shapes_and_ranges():
    gb = _gbox()  # 100 rows x 200 cols
    tiles = GeoboxTiles(gb, (30, 64))
    assert tiles.shape == (4, 4)  # ceil(100/30)=4, ceil(200/64)=4
    assert tiles.chunk_shape((0, 0)) == (30, 64)
    assert tiles.chunk_shape((3, 3)) == (10, 8)  # edge chunk
    with pytest.raises(IndexError):
        tiles.chunk_shape((4, 0))

    # bbox covering the top-left quarter in world coords
    bb = BoundingBox(10, 15, 20, 20)  # x 10..20 (cols 0..100), y 15..20 (rows 0..50)
    yy, xx = tiles.range_from_bbox(bb)
    assert list(yy) == [0, 1]  # rows 0..50 -> chunks 0,1
    assert list(xx) == [0, 1]  # cols 0..100 -> chunks 0,1

    # polygon refine: closed intersects (touching chunk boundary counts)
    poly = [[box_ring(10.0, 19.0, 11.0, 20.0)]]  # top-left corner 10x10px
    idxs = set(tiles.tiles(poly))
    assert (0, 0) in idxs


def test_maybe_int_snap_scale():
    assert maybe_int(3.0000001, 1e-6) == 3
    assert maybe_int(-2.9999999, 1e-6) == -3
    assert maybe_int(3.01, 1e-6) == 3.01
    assert snap_scale(0.9999999) == 1
    assert snap_scale(0.33333333333) == pytest.approx(1 / 3)
    assert snap_scale(0.4) == 0.4
    assert is_almost_int(4.0000001, 1e-6)
    assert not is_almost_int(4.3, 1e-6)


def test_masks():
    xx = np.array([1.0, np.nan, -999.0, 5.0])
    np.testing.assert_array_equal(valid_mask(xx, -999.0), [True, False, False, True])
    np.testing.assert_array_equal(invalid_mask(xx, -999.0), [False, True, True, False])
    ii = np.array([1, -999, 5])
    np.testing.assert_array_equal(valid_mask(ii, -999), [True, False, True])
    np.testing.assert_array_equal(valid_mask(ii, None), [True, True, True])


def test_axis_to_affine_roundtrip():
    gb = _gbox()
    ys, xs = gb.coordinates()
    a = affine_from_axis(xs, ys)
    assert a.almost_equals(gb.affine)
    res, off = data_resolution_and_offset(xs)
    assert res == pytest.approx(0.1)
    assert off == pytest.approx(10.0)


def test_iter_slices_doctest():
    assert list(iter_slices((5,), (2,))) == [
        (slice(0, 2, None),), (slice(2, 4, None),), (slice(4, 5, None),)
    ]
    got = list(iter_slices((5, 3), (3, 2)))
    assert len(got) == 4
    assert got[0] == (slice(0, 3), slice(0, 2))
    assert got[-1] == (slice(3, 5), slice(2, 3))


def test_roi_utils():
    roi = roi_normalise((slice(None), slice(3, -2)), (10, 20))
    assert roi == (slice(0, 10), slice(3, 18))
    assert roi_shape(roi) == (10, 15)
    assert roi_intersect((slice(0, 5),), (slice(3, 9),)) == (slice(3, 5),)
