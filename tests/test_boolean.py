"""Exact polygon union/intersection: golden shapes + hypothesis properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from datacube_core_spark.geom.boolean import (
    multipolygon_area,
    unary_intersection,
    unary_union,
)
from datacube_core_spark.geom.polygon import box_ring, points_strictly_inside_multi


def _box(l, b, r, t):
    return [[box_ring(l, b, r, t)]]


def _pts_inside(mp, pts):
    xs = np.array([p[0] for p in pts], dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    return points_strictly_inside_multi(xs, ys, mp).tolist()


def test_union_disjoint_is_multipolygon():
    u = unary_union([_box(0, 0, 1, 1), _box(5, 5, 6, 6)])
    assert len(u) == 2
    assert multipolygon_area(u) == pytest.approx(2.0)


def test_union_adjacent_rects_merges_shared_edge():
    # two rects sharing an edge -> one rect, no interior edge
    u = unary_union([_box(0, 0, 1, 1), _box(1, 0, 2, 1)])
    assert len(u) == 1 and len(u[0]) == 1
    assert multipolygon_area(u) == pytest.approx(2.0)
    assert _pts_inside(u, [(0.5, 0.5), (1.5, 0.5), (1.0, 0.5)]) == [True, True, True]


def test_union_overlapping_squares():
    u = unary_union([_box(0, 0, 2, 2), _box(1, 1, 3, 3)])
    assert multipolygon_area(u) == pytest.approx(4 + 4 - 1)
    assert _pts_inside(u, [(0.5, 0.5), (2.5, 2.5), (1.5, 1.5), (2.5, 0.5)]) == [
        True, True, True, False,
    ]


def test_union_cross_shape():
    u = unary_union([_box(-3, -1, 3, 1), _box(-1, -3, 1, 3)])
    assert multipolygon_area(u) == pytest.approx(12 + 12 - 4)
    assert len(u) == 1


def test_union_ring_of_squares_creates_hole():
    # 8 unit squares forming a ring around an empty 1x1 center
    boxes = []
    for i in (0, 1, 2):
        for j in (0, 1, 2):
            if (i, j) != (1, 1):
                boxes.append(_box(i, j, i + 1, j + 1))
    u = unary_union(boxes)
    assert len(u) == 1
    assert len(u[0]) == 2  # shell + hole
    assert multipolygon_area(u) == pytest.approx(8.0)
    assert _pts_inside(u, [(1.5, 1.5), (0.5, 0.5)]) == [False, True]


def test_union_contained_is_absorbed():
    u = unary_union([_box(0, 0, 10, 10), _box(2, 2, 3, 3)])
    assert len(u) == 1 and len(u[0]) == 1
    assert multipolygon_area(u) == pytest.approx(100.0)


def test_union_with_holes_in_input():
    donut = [[box_ring(0, 0, 4, 4), box_ring(1, 1, 3, 3)]]
    plug = _box(1, 1, 3, 3)
    u = unary_union([donut, plug])
    assert multipolygon_area(u) == pytest.approx(16.0)
    assert _pts_inside(u, [(2.0, 2.0)]) == [True]


def test_intersection_rects():
    x = unary_intersection([_box(0, 0, 2, 2), _box(1, 1, 3, 3)])
    assert multipolygon_area(x) == pytest.approx(1.0)
    assert _pts_inside(x, [(1.5, 1.5), (0.5, 0.5)]) == [True, False]


def test_intersection_disjoint_is_empty():
    x = unary_intersection([_box(0, 0, 1, 1), _box(5, 5, 6, 6)])
    assert multipolygon_area(x) == pytest.approx(0.0, abs=1e-12)


def test_union_patchwork_row_equals_strip():
    # a full row of the region patchwork unions into one strip
    from datacube_core_spark.sources.regions import region_multipolygons

    mps = [mp for rid, mp in region_multipolygons().items() if rid < 24]
    u = unary_union(mps)
    assert len(u) == 1 and len(u[0]) == 1
    assert multipolygon_area(u) == pytest.approx(360.0 * 17.0)


rect_st = st.tuples(
    st.integers(-20, 20), st.integers(-20, 20), st.integers(1, 15), st.integers(1, 15)
)


@settings(max_examples=60, deadline=None)
@given(rect_st, rect_st)
def test_union_area_inclusion_exclusion(r1, r2):
    """area(A ∪ B) = area(A) + area(B) − area(A ∩ B) for random int rects."""
    a = _box(r1[0], r1[1], r1[0] + r1[2], r1[1] + r1[3])
    b = _box(r2[0], r2[1], r2[0] + r2[2], r2[1] + r2[3])
    il = max(r1[0], r2[0]); ib = max(r1[1], r2[1])
    ir = min(r1[0] + r1[2], r2[0] + r2[2]); it = min(r1[1] + r1[3], r2[1] + r2[3])
    inter = max(0, ir - il) * max(0, it - ib)
    exp = r1[2] * r1[3] + r2[2] * r2[3] - inter
    u = unary_union([a, b])
    assert multipolygon_area(u) == pytest.approx(exp, rel=1e-9)


@settings(max_examples=40, deadline=None)
@given(rect_st, rect_st, st.integers(0, 10_000))
def test_union_membership_pointwise(r1, r2, seed):
    """Random points agree: inside(union) == inside(A) or inside(B)."""
    a = _box(r1[0], r1[1], r1[0] + r1[2], r1[1] + r1[3])
    b = _box(r2[0], r2[1], r2[0] + r2[2], r2[1] + r2[3])
    u = unary_union([a, b])
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-25, 40, 64)
    ys = rng.uniform(-25, 40, 64)
    got = points_strictly_inside_multi(xs, ys, u)
    exp = points_strictly_inside_multi(xs, ys, a) | points_strictly_inside_multi(xs, ys, b)
    np.testing.assert_array_equal(got, exp)


def test_spatial_extent_union_operator(spark):
    """Distributed ST_Union analog: the 24x10 region patchwork unions to
    one strip per row, and globally to a single world rect."""
    from datacube_core_spark.operators.extent import spatial_extent_union
    from datacube_core_spark.geom.polygon import unpack_multipolygon
    from datacube_core_spark.sources.regions import regions

    regs = regions(spark).withColumn("row", (F.col("region_id") / 24).cast("int"))
    per_row = spatial_extent_union(regs, geom_col="geom", group_cols=["row"])
    rows = per_row.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["area"] == pytest.approx(360.0 * 17.0)
        mp = unpack_multipolygon(bytes(r["extent"]))
        assert len(mp) == 1 and len(mp[0]) == 1  # one hole-free strip
        assert (r["left"], r["right"]) == (-180.0, 180.0)

    world = spatial_extent_union(regs, geom_col="geom").collect()
    assert len(world) == 1
    assert world[0]["area"] == pytest.approx(360.0 * 170.0)
    assert (world[0]["bottom"], world[0]["top"]) == (-85.0, 85.0)


def test_difference_and_symmetric_difference():
    from datacube_core_spark.geom.boolean import difference, symmetric_difference

    a, b = _box(0, 0, 2, 2), _box(1, 1, 3, 3)
    d = difference(a, b)
    assert multipolygon_area(d) == pytest.approx(3.0)
    assert _pts_inside(d, [(0.5, 0.5), (1.5, 1.5), (2.5, 2.5)]) == [True, False, False]
    s = symmetric_difference(a, b)
    assert multipolygon_area(s) == pytest.approx(6.0)
    assert _pts_inside(s, [(0.5, 0.5), (1.5, 1.5), (2.5, 2.5)]) == [True, False, True]
    # subtracting a centered plug cuts a hole
    hole = difference(_box(0, 0, 4, 4), _box(1, 1, 3, 3))
    assert multipolygon_area(hole) == pytest.approx(12.0)
    assert len(hole) == 1 and len(hole[0]) == 2


def test_pair_predicates_shapely_semantics():
    from datacube_core_spark.geom.boolean import (
        contains, crosses, disjoint, intersects, overlaps, touches, within,
    )

    A = _box(0, 0, 2, 2)
    far = _box(5, 5, 6, 6)
    edge = _box(2, 0, 4, 2)      # shares an edge with A
    corner = _box(2, 2, 3, 3)    # touches A at one point
    over = _box(1, 1, 3, 3)      # overlaps A
    inner = _box(0.5, 0.5, 1.5, 1.5)  # strictly inside A
    flush = _box(0, 0, 1, 1)     # inside A, sharing boundary

    assert disjoint(A, far) and not intersects(A, far)
    for t in (edge, corner):
        assert touches(A, t) and intersects(A, t) and not overlaps(A, t)
    assert overlaps(A, over) and intersects(A, over) and not touches(A, over)
    assert within(inner, A) and contains(A, inner) and not overlaps(A, inner)
    assert within(flush, A) and contains(A, flush)  # boundary contact allowed
    assert not within(A, inner)
    assert not crosses(A, over)  # poly/poly never crosses (DE-9IM)
    # self relations
    assert within(A, A) and contains(A, A) and intersects(A, A)
    assert not overlaps(A, A) and not touches(A, A)


def test_symmetric_difference_reflex_contact_hole():
    """Regression (found by Monte-Carlo drive): when the interior hole's
    corners lie exactly ON the outer shell (reflex contact), the hole must
    still attach — vertex-only strict-PIP probing dropped it and the
    result silently became the union."""
    from datacube_core_spark.geom.boolean import symmetric_difference

    a = _box(-1, -3, 1, 0)
    b = _box(-3, -2, 2, -1)
    s = symmetric_difference(a, b)
    assert multipolygon_area(s) == pytest.approx(6 + 5 - 2 * 2)  # 7, not union 9
    assert _pts_inside(s, [(0.0, -1.5), (0.0, -0.5), (-2.0, -1.5)]) == [False, True, True]


def test_pair_predicates_random_rect_montecarlo():
    from datacube_core_spark.geom.boolean import (
        contains, difference, disjoint, intersects, overlaps,
        symmetric_difference, touches, within,
    )

    rng = np.random.default_rng(123)
    for _ in range(120):
        x1, y1 = rng.integers(-8, 8, 2); w1, h1 = rng.integers(1, 8, 2)
        x2, y2 = rng.integers(-8, 8, 2); w2, h2 = rng.integers(1, 8, 2)
        ra = (int(x1), int(y1), int(x1 + w1), int(y1 + h1))
        rb = (int(x2), int(y2), int(x2 + w2), int(y2 + h2))
        A, B = _box(*ra), _box(*rb)
        il, ib = max(ra[0], rb[0]), max(ra[1], rb[1])
        ir, it = min(ra[2], rb[2]), min(ra[3], rb[3])
        iw, ih = ir - il, it - ib
        e_int = max(0, iw) * max(0, ih)
        e_its = iw >= 0 and ih >= 0
        aa, ab = int(w1 * h1), int(w2 * h2)
        assert intersects(A, B) == e_its
        assert disjoint(A, B) == (not e_its)
        assert touches(A, B) == (e_its and e_int == 0)
        assert within(A, B) == (ra[0] >= rb[0] and ra[1] >= rb[1] and ra[2] <= rb[2] and ra[3] <= rb[3])
        assert contains(B, A) == within(A, B)
        assert overlaps(A, B) == (0 < e_int < aa and e_int < ab)
        assert multipolygon_area(difference(A, B)) == pytest.approx(aa - e_int)
        assert multipolygon_area(symmetric_difference(A, B)) == pytest.approx(aa + ab - 2 * e_int)
