"""Golden-vector tests for the pure-python geometry core.

Expected values are the oracle vectors from FIXTURES.md §4, which mirror
the reference engine's own tests (reference ``tests/test_model.py:18-58``,
doctests ``datacube/model/__init__.py:732-740,890-903``).  Passing these
means our tile math matches the reference row-for-row.
"""

import math

import numpy as np
import pytest

from datacube_core_spark.geom import (
    GRID_A,
    GRID_B,
    GRID_D,
    Affine,
    BoundingBox,
    GeoBox,
    GridSpec,
    box_ring,
    grid_range,
    interiors_intersect,
    points_strictly_inside,
    rect_interiors_intersect,
    ring_area,
    clipped_area,
    pack_multipolygon,
    unpack_multipolygon,
)


def test_grid_range_vectors():
    # FIXTURES.md §4.3 (reference doctests model/__init__.py:890-903)
    assert list(grid_range(-4.0, -1.0, 3.0)) == [-2, -1]
    assert list(grid_range(1.0, 4.0, -3.0)) == [-2, -1]
    assert list(grid_range(-3.0, 0.0, 3.0)) == [-1]
    assert list(grid_range(-2.0, 1.0, 3.0)) == [-1, 0]
    assert list(grid_range(-1.0, 2.0, 3.0)) == [-1, 0]
    assert list(grid_range(0.0, 3.0, 3.0)) == [0]
    assert list(grid_range(1.0, 4.0, 3.0)) == [0, 1]


def test_gridspec_polygon_tiles():
    # FIXTURES.md §4.1: polygon on grid A -> exact 7-cell set
    poly = [np.array([(10, 12.2), (10.8, 13), (13, 10.8), (12.2, 10), (10, 12.2)])]
    cells = {idx for idx, _ in GRID_A.tiles_from_geopolygon([poly])}
    assert cells == {(0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1)}

    # pixel-center coordinates of cell (2, 0)
    gb = GRID_A.tile_geobox((2, 0))
    ys, xs = gb.coordinates()
    np.testing.assert_allclose(xs, np.linspace(12.05, 12.95, 10))
    np.testing.assert_allclose(ys, np.linspace(10.95, 10.05, 10))
    assert gb.shape == (10, 10)


def test_gridspec_bbox_tiles_doctest_grid():
    # FIXTURES.md §4.2 (reference doctest model/__init__.py:735-740)
    tiles = list(GRID_B.tiles(BoundingBox(140, -50, 141.5, -48.5)))
    idxs = [t for t, _ in tiles]
    assert idxs == [(0, 0), (1, 0), (0, 1), (1, 1)]
    gb00 = dict(tiles)[(0, 0)]
    assert gb00.shape == (10, 10)
    assert gb00.affine.almost_equals(Affine(0.1, 0.0, 139.95, 0.0, -0.1, -49.05))
    gb11 = dict(tiles)[(1, 1)]
    assert gb11.affine.almost_equals(Affine(0.1, 0.0, 140.95, 0.0, -0.1, -48.05))


def test_gridspec_upperleft():
    # FIXTURES.md §4.4 (reference tests/test_model.py:44-58): negative
    # tile_size y (upper-left origin, WELD-calculator-validated)
    bbox = BoundingBox(1934615, 2376460, 1937615, 2379460)
    cells = dict(GRID_D.tiles(bbox))
    assert set(cells) == {(30, 6)}
    tb = cells[(30, 6)].extent_bbox
    assert (tb.left, tb.bottom, tb.right, tb.top) == (1934400, 2264800, 2084400, 2414800)

    # bottom-left-origin variant of the same WELD grid: 21 vertical cells,
    # so row 6-from-top == row 15-from-bottom, same tile footprint.
    grid_pos = GridSpec(
        "EPSG:5070", tile_size=(150000, 150000), resolution=(-30, 30), origin=(14800.0, -2565600.0)
    )
    cells_pos = dict(grid_pos.tiles(bbox))
    assert set(cells_pos) == {(30, 15)}
    tb2 = cells_pos[(30, 15)].extent_bbox
    assert (tb2.left, tb2.bottom, tb2.right, tb2.top) == (1934400, 2264800, 2084400, 2414800)


def test_tile_coords_rule():
    # resolution<0<size -> +1 (anchor at top edge)
    y, x = GRID_A.tile_coords((1, 2))
    assert (y, x) == (13.0, 11.0)  # y = (2+1)*1+10, x = 1*1+10
    # negative tile size: no +1 on that axis
    y2, x2 = GRID_D.tile_coords((30, 6))
    assert x2 == 30 * 150000 + (-2565600)
    assert y2 == 6 * (-150000) + 3314800


def test_point_tile_floor_rule():
    g = GridSpec("EPSG:4326", (1, 1), (-0.1, 0.1), origin=(10, 10))
    assert g.point_tile(10.5, 10.5) == (0, 0)
    assert g.point_tile(11.0, 10.5) == (1, 0)  # on shared edge -> greater side
    assert g.point_tile(9.99, 10.5) == (-1, 0)


def test_align_pix_geobox_from_bbox():
    gb = GeoBox.from_bbox(BoundingBox(0.03, 0.0, 1.03, 1.0), resolution=(-0.1, 0.1))
    # x snaps down to 0.0, width covers through 1.03 -> 11 px
    x0, y0 = gb.affine * (0, 0)
    assert x0 == 0.0
    assert gb.width == 11
    # y negative res snaps top up
    assert y0 == 1.0
    assert gb.height == 10


def test_intersects_not_touches_rect():
    # polygons sharing only an edge must NOT intersect (reference
    # _base.py:1302-1305 semantics)
    sq = [box_ring(0, 0, 1, 1)]
    assert not rect_interiors_intersect(sq, 1, 0, 2, 1)  # edge contact
    assert not rect_interiors_intersect(sq, 1, 1, 2, 2)  # corner contact
    assert rect_interiors_intersect(sq, 0.5, 0.5, 2, 2)  # real overlap
    assert rect_interiors_intersect(sq, -1, -1, 2, 2)  # containment


def test_polygon_with_hole():
    outer = box_ring(0, 0, 10, 10)
    hole = box_ring(4, 4, 6, 6)
    poly = [outer, hole]
    # rect fully inside the hole -> no interior intersection
    assert not rect_interiors_intersect(poly, 4.5, 4.5, 5.5, 5.5)
    # rect overlapping the ring part -> yes
    assert rect_interiors_intersect(poly, 1, 1, 2, 2)
    assert clipped_area(poly, 0, 0, 10, 10) == pytest.approx(100 - 4)


def test_pip_strict_interior():
    poly = [box_ring(0, 0, 2, 2), box_ring(0.5, 0.5, 1.5, 1.5)]
    xs = np.array([0.25, 1.0, 0.0, 2.0, 1.0, 0.5])
    ys = np.array([0.25, 1.0, 1.0, 2.0, 0.25, 1.0])
    got = points_strictly_inside(xs, ys, poly)
    # in-ring, in-hole, on-outer-edge, on-corner, in-ring, on-hole-edge
    assert got.tolist() == [True, False, False, False, True, False]


def test_pip_concave():
    # concave L-shape
    ring = np.array([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)], dtype=float)
    xs = np.array([0.5, 2.0, 2.0, 0.5])
    ys = np.array([0.5, 0.5, 2.0, 2.0])
    got = points_strictly_inside(xs, ys, [ring])
    assert got.tolist() == [True, True, False, True]


def test_interiors_intersect_general():
    a = [box_ring(0, 0, 2, 2)]
    b = [box_ring(1, 1, 3, 3)]
    c = [box_ring(2, 0, 4, 2)]  # shares edge with a
    assert interiors_intersect(a, b)
    assert not interiors_intersect(a, c)
    # proper cross with no vertices inside
    plus_h = [np.array([(-3, -1), (3, -1), (3, 1), (-3, 1)], dtype=float)]
    plus_v = [np.array([(-1, -3), (1, -3), (1, 3), (-1, 3)], dtype=float)]
    assert interiors_intersect(plus_h, plus_v)


def test_ring_area_and_pack_roundtrip():
    r = box_ring(0, 0, 2, 3)
    assert ring_area(r) == 6.0
    mp = [[box_ring(0, 0, 1, 1), box_ring(0.2, 0.2, 0.4, 0.4)], [box_ring(5, 5, 6, 6)]]
    mp2 = unpack_multipolygon(pack_multipolygon(mp))
    assert len(mp2) == 2 and len(mp2[0]) == 2
    np.testing.assert_array_equal(mp2[0][1], mp[0][1])
    np.testing.assert_array_equal(mp2[1][0], mp[1][0])


def test_tile_buffer():
    # buffered tiles expand candidate set (reference grid_workflow tile_buffer)
    mp = [[box_ring(10.2, 10.2, 10.8, 10.8)]]
    base = {i for i, _ in GRID_A.tiles_from_geopolygon(mp)}
    assert base == {(0, 0)}
    buffered = {i for i, _ in GRID_A.tiles_from_geopolygon(mp, tile_buffer=(0.3, 0.3))}
    assert buffered == {(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)}
