"""Ellipsoidal Lambert Conformal Conic (geom/lcc.py): validated by
INDEPENDENT math — conformality itself (isotropic local scale, which
the equal-area Albers provably fails, so this test distinguishes the
families), unit scale on both standard parallels, the spherical closed
form in the f→0 limit, nanometre round-trips, and numpy / Catalyst /
DuckDB dialect fuzz-twins."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom.lcc import (
    LCC_PARAMS,
    lcc_cols,
    lcc_constants,
    lcc_constants_from,
    lcc_forward,
    lcc_forward_c,
    lcc_inverse,
    sql_lcc_exprs,
)
from datacube_core_spark.geom.mercator import get_transformer, have_transform

RNG = np.random.default_rng(3112)


def _domain(crs):
    if crs == "EPSG:3112":
        return (110.0, 155.0, -45.0, -8.0)
    return (-5.0, 9.0, 41.0, 51.0)  # Lambert-93 / France


@pytest.mark.parametrize("crs", sorted(LCC_PARAMS))
def test_round_trip_nanometer(crs):
    l, r, b, t = _domain(crs)
    lon = RNG.uniform(l, r, 20000)
    lat = RNG.uniform(b, t, 20000)
    x, y = lcc_forward(lon, lat, crs)
    lon2, lat2 = lcc_inverse(x, y, crs)
    assert np.max(np.abs(lon2 - lon)) < 1e-11
    assert np.max(np.abs(lat2 - lat)) < 1e-11


@pytest.mark.parametrize("crs", sorted(LCC_PARAMS))
def test_conformality_isotropic_scale(crs):
    """THE defining property: at any point the local scale along the
    parallel equals the scale along the meridian (angles preserved).
    Ellipsoidal arcs from first principles: parallel arc a·m(φ)·Δλ,
    meridian arc M(φ)·Δφ with M = a(1−e²)/(1−e²sin²φ)^{3/2}."""
    c = lcc_constants(crs)
    l, r, b, t = _domain(crs)
    d = 1e-6
    for _ in range(25):
        lo = RNG.uniform(l, r)
        p = RNG.uniform(b, t)
        x0, y0 = lcc_forward(np.array([lo]), np.array([p]), crs)
        x1, y1 = lcc_forward(np.array([lo + d]), np.array([p]), crs)
        x2, y2 = lcc_forward(np.array([lo]), np.array([p + d]), crs)
        s = math.sin(math.radians(p))
        m = math.cos(math.radians(p)) / math.sqrt(1.0 - c["e2"] * s * s)
        big_m = c["a"] * (1.0 - c["e2"]) / (1.0 - c["e2"] * s * s) ** 1.5
        kp = math.hypot(float(x1[0] - x0[0]), float(y1[0] - y0[0])) / (c["a"] * m * math.radians(d))
        km = math.hypot(float(x2[0] - x0[0]), float(y2[0] - y0[0])) / (big_m * math.radians(d))
        assert kp / km == pytest.approx(1.0, abs=5e-7)


@pytest.mark.parametrize("crs,parallels", [
    ("EPSG:3112", (-18.0, -36.0)),
    ("EPSG:2154", (44.0, 49.0)),
])
def test_unit_scale_on_standard_parallels(crs, parallels):
    c = lcc_constants(crs)
    lam0_deg = math.degrees(c["lam0"])
    for p in parallels:
        d = 1e-5
        x1, y1 = lcc_forward(np.array([lam0_deg + 4.0]), np.array([p]), crs)
        x2, y2 = lcc_forward(np.array([lam0_deg + 4.0 + d]), np.array([p]), crs)
        chord = math.hypot(float(x2[0] - x1[0]), float(y2[0] - y1[0]))
        s = math.sin(math.radians(p))
        m = math.cos(math.radians(p)) / math.sqrt(1.0 - c["e2"] * s * s)
        assert chord == pytest.approx(c["a"] * m * math.radians(d), rel=1e-7)


def test_sphere_limit_matches_closed_form():
    """f → 0 collapses to the EXACT spherical LCC (Snyder 15-1..15-4 with
    t → tan(π/4 − φ/2)): n = ln(cosφ₁/cosφ₂)/ln(t₁/t₂), F = cosφ₁/(n t₁ⁿ),
    ρ = F·tⁿ on the unit sphere."""
    c = lcc_constants_from(1.0, 1e-13, -18.0, -36.0, 0.0, 134.0, 0.0, 0.0)
    lon = np.linspace(115.0, 150.0, 31)
    lat = np.linspace(-44.0, -9.0, 29)
    LO, LA = np.meshgrid(lon, lat)
    x, y = lcc_forward_c(LO.ravel(), LA.ravel(), c)

    p1, p2 = math.radians(-18.0), math.radians(-36.0)
    t_s = lambda p: math.tan(math.pi / 4.0 - p / 2.0)  # noqa: E731
    n_s = math.log(math.cos(p1) / math.cos(p2)) / math.log(t_s(p1) / t_s(p2))
    f_s = math.cos(p1) / (n_s * t_s(p1) ** n_s)
    t_arr = np.tan(np.pi / 4.0 - np.deg2rad(LA.ravel()) / 2.0)
    rho = f_s * t_arr**n_s
    rho0 = f_s * t_s(0.0) ** n_s
    theta = n_s * np.deg2rad(LO.ravel() - 134.0)
    assert np.max(np.abs(x - rho * np.sin(theta))) < 1e-9
    assert np.max(np.abs(y - (rho0 - rho * np.cos(theta)))) < 1e-9


def test_origin_quadrants_and_false_origin():
    """(λ₀, φ₀) maps to (E₀, N₀); quadrant signs hold for n of either
    sign (EPSG:3112 southern n<0, EPSG:2154 northern n>0)."""
    x, y = lcc_forward(np.array([134.0]), np.array([0.0]), "EPSG:3112")
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    x, y = lcc_forward(np.array([3.0]), np.array([46.5]), "EPSG:2154")
    assert x[0] == pytest.approx(700000.0, abs=1e-6)
    assert y[0] == pytest.approx(6600000.0, abs=1e-6)
    x, y = lcc_forward(np.array([140.0, 128.0]), np.array([-25.0, -25.0]), "EPSG:3112")
    assert x[0] > 0 > x[1]
    x, y = lcc_forward(np.array([5.0, 1.0]), np.array([47.0, 47.0]), "EPSG:2154")
    assert x[0] > 700000.0 > x[1]


def test_registry_seam_resolves_lcc():
    assert have_transform("EPSG:4326", "EPSG:3112")
    assert have_transform("EPSG:2154", "EPSG:4326")
    # LCC → Albers composes through the 4326 pivot (both Australian grids)
    fwd = get_transformer("EPSG:3112", "EPSG:3577")
    from datacube_core_spark.geom.albers import albers_forward

    x0, y0 = lcc_forward(np.array([135.2]), np.array([-24.7]), "EPSG:3112")
    x, y = fwd(x0, y0)
    xr, yr = albers_forward(np.array([135.2]), np.array([-24.7]), "EPSG:3577")
    assert abs(x[0] - xr[0]) < 1e-6 and abs(y[0] - yr[0]) < 1e-6


def test_catalyst_matches_numpy(spark):
    rows = [(i, float(lon), float(lat)) for i, (lon, lat) in enumerate(
        [(134.0, -10.0), (140.3, -25.2), (117.9, -34.6), (151.2, -33.9),
         (2.35, 48.86), (5.37, 43.30), (-1.55, 47.22), (7.75, 48.58)]
    )]
    df = spark.createDataFrame(rows, "id LONG, lon DOUBLE, lat DOUBLE")
    for crs in sorted(LCC_PARAMS):
        e, n = lcc_cols(F.col("lon"), F.col("lat"), crs)
        sel = df.select("id", e.alias("e"), n.alias("n"))
        got = {r["id"]: (r["e"], r["n"]) for r in sel.collect()}
        for rid, lon, lat in rows:
            x, y = lcc_forward(np.array([lon]), np.array([lat]), crs)
            assert abs(got[rid][0] - x[0]) < 1e-6
            assert abs(got[rid][1] - y[0]) < 1e-6
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "*(1) Project" in plan  # whole-stage-codegen'd


def test_sql_twin_fuzz_band():
    import duckdb

    con = duckdb.connect()
    lon = RNG.uniform(-180.0, 180.0, 400)
    # keep |lat| < 89.9: t(φ)→0 at the pole and ρ=exp(n·ln t) hits the
    # log singularity — same domain note as PROJ's lcc
    lat = RNG.uniform(-85.0, 85.0, 400)
    for crs in sorted(LCC_PARAMS):
        e_sql, n_sql = sql_lcc_exprs("lon", "lat", crs)
        vals = ",".join(f"({i}, {lo!r}, {la!r})" for i, (lo, la) in enumerate(zip(lon, lat)))
        rows = con.execute(
            f"SELECT id, {e_sql}, {n_sql} FROM (VALUES {vals}) AS t(id, lon, lat) ORDER BY id"
        ).fetchall()
        x, y = lcc_forward(lon, lat, crs)
        for rid, e, n in rows:
            # scale-aware band: far from the domain ρ grows huge; compare
            # to 1e-5 relative-or-absolute
            tol = max(1e-5, abs(x[rid]) * 1e-12, abs(y[rid]) * 1e-12)
            assert abs(e - x[rid]) < tol
            assert abs(n - y[rid]) < tol


def test_inverse_apex_stability():
    """Review-pass (r6): at the cone apex ρ → 0 drives t to 0 (n > 0) or
    +inf (n < 0); the Newton polish then computes inf − inf / divides by
    cos φ → 0 and returned NaN (observed on EPSG:2154, whose ρ₀ rounding
    leaves t tiny-but-finite and escaping an exact-zero mask).  Near the
    apex the series estimate must be kept; away from it the polish must
    still run."""
    for crs in sorted(LCC_PARAMS):
        n = lcc_constants(crs)["n"]
        apex_lat = 90.0 if n > 0 else -90.0
        for lat in (apex_lat, apex_lat * 0.99999999):
            x, y = lcc_forward([30.0], [lat], crs)
            lon2, lat2 = lcc_inverse(x, y, crs)
            assert np.isfinite(lat2[0]) and np.isfinite(lon2[0]), (crs, lat)
            assert abs(lat2[0] - apex_lat) < 1e-5, (crs, lat, lat2[0])
        # near-but-outside the apex band: polish active, round trip tight
        lat = np.array([apex_lat * f for f in (0.9999, 0.999, 0.98)])
        x, y = lcc_forward(np.full(3, 30.0), lat, crs)
        _, lat2 = lcc_inverse(x, y, crs)
        assert np.all(np.abs(lat2 - lat) < 1e-7), crs
