"""Property-based tests (hypothesis) for the pure-python geometry core.

The reference has no property-based testing (SURVEY §5); these pin the
invariants that row-for-row parity rests on, over adversarial floats.
"""

import math

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from datacube_core_spark.geom import BoundingBox, GridSpec, box_ring, grid_range
from datacube_core_spark.geom.classify import classify_subcells
from datacube_core_spark.geom.polygon import (
    clipped_area,
    points_strictly_inside,
    ring_area,
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)
small = st.floats(min_value=-500.0, max_value=500.0, allow_nan=False, allow_infinity=False)
step_st = st.floats(min_value=0.01, max_value=100.0, allow_nan=False, allow_infinity=False)


@given(lo=small, span=st.floats(min_value=1e-6, max_value=1000.0), step=step_st)
@settings(max_examples=300, deadline=None)
def test_grid_range_covers_exactly_overlapping_cells(lo, span, step):
    hi = lo + span
    ks = list(grid_range(lo, hi, step))
    assert ks == sorted(ks)
    assert len(ks) >= 1
    # definition: floor(lo/step) .. ceil(hi/step)-1
    assert ks[0] == math.floor(lo / step)
    assert ks[-1] == math.ceil(hi / step) - 1
    # negative-step flip equivalence
    ks_neg = list(grid_range(lo, hi, -step))
    assert ks_neg == list(range(math.floor(-hi / step), math.ceil(-lo / step)))


@given(x=small, y=small, sx=step_st, sy=step_st, ox=small, oy=small)
@settings(max_examples=300, deadline=None)
def test_point_tile_contains_point(x, y, sx, sy, ox, oy):
    g = GridSpec("C", tile_size=(sy, sx), resolution=(-sy / 10, sx / 10), origin=(oy, ox))
    tx, ty = g.point_tile(x, y)
    bb = g.tile_bbox((tx, ty))
    # closed-left / open-right convention (floor rule), with float slack
    # one ulp wide at the seams
    eps_x = abs(x) * 1e-12 + 1e-12
    eps_y = abs(y) * 1e-12 + 1e-12
    assert bb.left - eps_x <= x < bb.right + eps_x
    assert bb.bottom - eps_y <= y < bb.top + eps_y


@given(
    l=small, b=small,
    w=st.floats(min_value=0.1, max_value=100.0),
    h=st.floats(min_value=0.1, max_value=100.0),
    cl=small, cb=small,
    cw=st.floats(min_value=0.1, max_value=100.0),
    ch=st.floats(min_value=0.1, max_value=100.0),
)
@settings(max_examples=300, deadline=None)
def test_clipped_area_bounds_and_exactness(l, b, w, h, cl, cb, cw, ch):
    poly = [box_ring(l, b, l + w, b + h)]
    area = clipped_area(poly, cl, cb, cl + cw, cb + ch)
    # bounded by both areas
    assert area <= w * h + 1e-6
    assert area <= cw * ch + 1e-6
    # rect ∩ rect has a closed form
    ix = max(0.0, min(l + w, cl + cw) - max(l, cl))
    iy = max(0.0, min(b + h, cb + ch) - max(b, cb))
    assert area == pytest.approx(ix * iy, rel=1e-9, abs=1e-9)


@given(
    cx=st.floats(min_value=-100, max_value=100),
    cy=st.floats(min_value=-100, max_value=100),
    n=st.integers(min_value=3, max_value=12),
    r=st.floats(min_value=0.5, max_value=50.0),
    px=st.floats(min_value=-160, max_value=160),
    py=st.floats(min_value=-160, max_value=160),
)
@settings(max_examples=300, deadline=None)
def test_pip_convex_matches_halfplane_test(cx, cy, n, r, px, py):
    # regular convex n-gon around (cx, cy)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    # both formulations are valid within float representation; at points
    # within ~1 ulp of an edge they may legitimately disagree — exclude
    # that measure-zero band (exact-boundary cases are covered by the
    # deterministic tests in test_geom_core.py)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        d = abs(np.cross(b - a, np.array([px, py]) - a)) / (np.hypot(*(b - a)) or 1.0)
        assume(d > 1e-9)
    got = bool(points_strictly_inside(np.array([px]), np.array([py]), [ring])[0])

    # half-plane test: strictly left of every CCW edge
    strict = True
    on_edge = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if cross == 0.0:
            on_edge = True
        elif cross < 0:
            strict = False
    exp = strict and not on_edge
    assert got == exp


@given(
    l=st.floats(min_value=-50, max_value=40),
    b=st.floats(min_value=-50, max_value=40),
    w=st.floats(min_value=0.5, max_value=10),
    h=st.floats(min_value=0.5, max_value=10),
)
@settings(max_examples=60, deadline=None)
def test_classify_full_cells_strictly_inside(l, b, w, h):
    mp = [[box_ring(l, b, l + w, b + h)]]
    full, bnd = classify_subcells(mp, -60.0, -60.0, 0.5)
    # sample a point inside every full cell: must be strictly inside
    for cxi, cyi in full[:50]:
        x = -60.0 + (cxi + 0.5) * 0.5
        y = -60.0 + (cyi + 0.5) * 0.5
        assert points_strictly_inside(np.array([x]), np.array([y]), mp[0])[0]


@given(st.lists(st.tuples(small, small, step_st, step_st), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_bbox_union_contains_all(boxes):
    from datacube_core_spark.geom import bbox_union

    bbs = [BoundingBox(x, y, x + w, y + h) for x, y, w, h in boxes]
    u = bbox_union(bbs)
    for bb in bbs:
        assert u.left <= bb.left and u.right >= bb.right
        assert u.bottom <= bb.bottom and u.top >= bb.top


@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=2, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_rolling_fingerprint_order_sensitive_pure(tokens):
    """Pure-python mirror of rolling_fingerprint_col's fold: equal token
    sequences hash equal; a genuine reorder changes the hash unless the
    fold value collides (verify no SYSTEMATIC order-insensitivity)."""
    import hashlib

    from datacube_core_spark.functions.text import ROLL_MOD, ROLL_MULT

    def h32(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)

    def fold(toks):
        acc = 0
        for t in toks:
            acc = (acc * ROLL_MULT + h32(t)) % ROLL_MOD
        return acc

    assert fold(tokens) == fold(list(tokens))
    rev = list(reversed(tokens))
    if rev != tokens:
        # positional weighting: reversal of a non-palindrome with ≥2
        # distinct tokens must change the fold (B > max hash gap makes a
        # collision here arithmetically impossible for these short lists)
        if len(set(tokens)) >= 2:
            assert fold(rev) != fold(tokens)
