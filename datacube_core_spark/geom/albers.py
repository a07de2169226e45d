"""Ellipsoidal Albers Equal-Area Conic — EPSG:3577 / EPSG:5070 native.

Closes the SURVEY §2.8 "conic CRS families" partial (VERDICT r5 item 3):
EPSG:3577 (GDA94 / Australian Albers) is the reference's canonical test
grid CRS (``datacube/testutils/geom.py:23-26`` — AlbersGS) and the
most-cited real ODC deployment grid; EPSG:5070 (NAD83 / Conus Albers) is
the repo's GRID_D.  The sandbox has no pyproj, but Albers is closed-form
published math (Snyder 1987, *Map Projections — A Working Manual*,
pp. 98-103, eqs. 14-1..14-21 + the authalic-latitude series 3-18), so it
joins Mercator/sinusoidal/UTM as a natively-registered pair on the
``register_transform`` seam — ``to_crs``, ``compute_reproject_roi`` and
the warp operators light up without code changes.

Forward (ellipsoid a, e²; standard parallels φ₁, φ₂; origin φ₀, λ₀):

    m(φ) = cos φ / √(1 − e² sin²φ)
    q(φ) = (1−e²)[ sinφ/(1−e² sin²φ) − (1/2e)·ln((1−e sinφ)/(1+e sinφ)) ]
    n  = (m₁² − m₂²) / (q₂ − q₁)         C = m₁² + n q₁
    ρ(φ) = a √(C − n q)/n                θ = n (λ − λ₀)
    E = E₀ + ρ sinθ                       N = N₀ + ρ₀ − ρ cosθ

The SIGNED formulation is used throughout: for southern standard
parallels (EPSG:3577) n < 0 and ρ, ρ₀, θ all carry its sign, which makes
every quadrant come out right with no hemisphere special-casing (east of
λ₀ is still +E, north of φ₀ still +N).

Inverse: ρ = sign(n)·√(E′² + (ρ₀−N′)²), θ from atan2 with n's sign
folded in, q = (C − ρ²n²/a²)/n, authalic latitude β = asin(q/q_pole),
then the published series 3-18 to geodetic φ plus two Newton polish
iterations of Snyder 3-16 (nanometre-class round-trips, fixed iteration
count so the kernel stays branch-free and vectorized).

Validation (tests/test_albers.py) is by INDEPENDENT structure, mirroring
test_tmerc.py: the equal-area property is checked exactly (an annular
sector's area must equal the ellipsoidal quad area (a²Δλ/2)|q_t − q_b| —
a closed-form identity unique to this projection), scale along both
standard parallels must be 1, the sphere limit (f→0) must match the
closed-form spherical Albers, and the three dialects (numpy / Catalyst /
DuckDB SQL) are fuzz-twinned.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

# GRS80 (both GDA94 and NAD83 use it)
A_GRS80 = 6378137.0
F_GRS80 = 1.0 / 298.257222101
PI = 3.141592653589793

# EPSG code → (a, f, φ1°, φ2°, φ0°, λ0°, E0, N0)
ALBERS_PARAMS: Dict[str, Tuple[float, float, float, float, float, float, float, float]] = {
    "EPSG:3577": (A_GRS80, F_GRS80, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
    "EPSG:5070": (A_GRS80, F_GRS80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
}


def _q_scalar(sin_phi: float, e: float, e2: float) -> float:
    return (1.0 - e2) * (
        sin_phi / (1.0 - e2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * sin_phi) / (1.0 + e * sin_phi))
    )


def aea_constants(crs: str) -> dict:
    """Projection constants (n, C, ρ₀, q_pole, …) for a registered code."""
    return aea_constants_from(*ALBERS_PARAMS[crs.strip().upper()])


def aea_constants_from(
    a: float, f: float, phi1d: float, phi2d: float,
    phi0d: float, lam0d: float, e0: float, n0: float,
) -> dict:
    """Constants from explicit parameters (tests use this for the
    sphere-limit check with a vanishing flattening)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    s1, s2, s0 = (math.sin(math.radians(p)) for p in (phi1d, phi2d, phi0d))
    c1, c2 = (math.cos(math.radians(p)) for p in (phi1d, phi2d))
    m1 = c1 / math.sqrt(1.0 - e2 * s1 * s1)
    m2 = c2 / math.sqrt(1.0 - e2 * s2 * s2)
    q1 = _q_scalar(s1, e, e2)
    q2 = _q_scalar(s2, e, e2)
    q0 = _q_scalar(s0, e, e2)
    qp = _q_scalar(1.0, e, e2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    big_c = m1 * m1 + n * q1
    rho0 = a * math.sqrt(big_c - n * q0) / n
    # authalic→geodetic series coefficients (Snyder 3-18)
    e4, e6 = e2 * e2, e2 * e2 * e2
    ser = (
        e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        761.0 * e6 / 45360.0,
    )
    return {
        "a": a, "e": e, "e2": e2, "n": n, "C": big_c, "rho0": rho0,
        "qp": qp, "lam0": math.radians(lam0d), "e0": e0, "n0": n0, "series": ser,
    }


_CONST = {crs: aea_constants(crs) for crs in ALBERS_PARAMS}


def _q_arr(sin_phi: np.ndarray, e: float, e2: float) -> np.ndarray:
    return (1.0 - e2) * (
        sin_phi / (1.0 - e2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sin_phi) / (1.0 + e * sin_phi))
    )


def albers_forward(lon, lat, crs: str) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized forward (degrees → metres)."""
    return albers_forward_c(lon, lat, _CONST[crs.strip().upper()])


def albers_forward_c(lon, lat, c: dict) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    q = _q_arr(np.sin(phi), c["e"], c["e2"])
    # (a/n)·√(C−nq), association matching the Catalyst/SQL dialects so
    # the three agree to the last ulp-or-two
    rho = (c["a"] / c["n"]) * np.sqrt(c["C"] - c["n"] * q)
    # wrap Δλ to (−π, π] so a λ0 near the dateline projects its far side
    dlam = np.remainder(lam - c["lam0"] + PI, 2.0 * PI) - PI
    theta = c["n"] * dlam
    return c["e0"] + rho * np.sin(theta), c["n0"] + c["rho0"] - rho * np.cos(theta)


def albers_inverse(x, y, crs: str) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse (metres → degrees)."""
    return albers_inverse_c(x, y, _CONST[crs.strip().upper()])


def albers_inverse_c(x, y, c: dict) -> Tuple[np.ndarray, np.ndarray]:
    e, e2, n = c["e"], c["e2"], c["n"]
    xp = np.asarray(x, dtype=np.float64) - c["e0"]
    yp = c["rho0"] - (np.asarray(y, dtype=np.float64) - c["n0"])
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.sqrt(xp * xp + yp * yp)
    theta = np.arctan2(sgn * xp, sgn * yp)
    q = (c["C"] - (rho * n / c["a"]) ** 2) / n
    ratio = np.clip(q / c["qp"], -1.0, 1.0)
    beta = np.arcsin(ratio)
    s2b, s4b, s6b = np.sin(2 * beta), np.sin(4 * beta), np.sin(6 * beta)
    a1, a2, a3 = c["series"]
    phi = beta + a1 * s2b + a2 * s4b + a3 * s6b
    # pole guard: when the inverse q lands at (or within float-rounding
    # distance of) ±qp the polish step divides by cos(φ) → 0, amplifying
    # the ~ulp residual of f into an O(1)-radian error.  There the series
    # estimate is already far inside the series' own error band (|β| is
    # within ~1.5e-6 rad of the pole only when |ratio| ≥ 1−1e-12), so
    # skip the polish for those points rather than corrupt it.
    at_pole = np.abs(ratio) >= 1.0 - 1e-12
    phi_series = phi
    # two Newton polish steps of Snyder 3-16 (fixed count, branch-free)
    # (errstate: at_pole lanes may hit log(0) at s=±1 — their values are
    # discarded by the np.where below)
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(2):
            s = np.sin(phi)
            one = 1.0 - e2 * s * s
            f_val = q / (1.0 - e2) - s / one + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
            phi = phi + (one * one / (2.0 * np.where(at_pole, 1.0, np.cos(phi)))) * f_val
    phi = np.where(at_pole, phi_series, phi)
    lam = c["lam0"] + theta / n
    lon = np.rad2deg(np.remainder(lam + PI, 2.0 * PI) - PI)
    return lon, np.rad2deg(phi)


def albers_transforms(crs: str):
    """(fwd, inv) lon/lat ↔ this Albers CRS, or None if not registered —
    the ``_resolve_lazy`` hook shape, same contract as utm_transforms."""
    key = crs.strip().upper()
    if key not in ALBERS_PARAMS:
        return None

    def fwd(lon, lat, _k=key):
        return albers_forward(lon, lat, _k)

    def inv(x, y, _k=key):
        return albers_inverse(x, y, _k)

    return fwd, inv


# ---------------------------------------------------------------------------
# Catalyst columns (Spark plans) — same operation order as numpy
# ---------------------------------------------------------------------------


def albers_cols(lon_col, lat_col, crs: str):
    """(easting, northing) Catalyst expressions — pure JVM whole-stage
    codegen (log/sin/cos/sqrt only).  The forward has no series loop, so
    unlike ``tmerc.utm_cols`` the tree stays well under janino's limit."""
    from pyspark.sql import functions as F

    c = _CONST[crs.strip().upper()]
    e, e2, n = c["e"], c["e2"], c["n"]
    phi = lat_col * F.lit(PI / 180.0)
    s = F.sin(phi)
    q = F.lit(1.0 - e2) * (
        s / (F.lit(1.0) - F.lit(e2) * s * s)
        - F.lit(1.0 / (2.0 * e))
        * F.log((F.lit(1.0) - F.lit(e) * s) / (F.lit(1.0) + F.lit(e) * s))
    )
    rho = F.lit(c["a"] / n) * F.sqrt(F.lit(c["C"]) - F.lit(n) * q)
    lam = lon_col * F.lit(PI / 180.0)
    dlam = F.pmod(lam - F.lit(c["lam0"]) + F.lit(PI), F.lit(2.0 * PI)) - F.lit(PI)
    theta = F.lit(n) * dlam
    easting = F.lit(c["e0"]) + rho * F.sin(theta)
    northing = F.lit(c["n0"] + c["rho0"]) - rho * F.cos(theta)
    return easting, northing


# ---------------------------------------------------------------------------
# DuckDB SQL (oracle twin) — same operation order
# ---------------------------------------------------------------------------


def sql_albers_exprs(lon: str, lat: str, crs: str) -> Tuple[str, str]:
    """(easting_sql, northing_sql) mirroring :func:`albers_cols` term by
    term (compare floored/rounded — libm ulp differences only)."""
    c = _CONST[crs.strip().upper()]
    e, e2, n = c["e"], c["e2"], c["n"]

    def lit(v: float) -> str:
        return f"CAST({float(v)!r} AS DOUBLE)"

    phi = f"({lat} * {lit(PI / 180.0)})"
    s = f"SIN({phi})"
    q = (
        f"({lit(1.0 - e2)} * ({s} / ({lit(1.0)} - {lit(e2)} * {s} * {s})"
        f" - {lit(1.0 / (2.0 * e))} * LN(({lit(1.0)} - {lit(e)} * {s}) / ({lit(1.0)} + {lit(e)} * {s}))))"
    )
    rho = f"({lit(c['a'] / n)} * SQRT({lit(c['C'])} - {lit(n)} * {q}))"
    lam = f"({lon} * {lit(PI / 180.0)})"
    # Spark pmod ≡ DuckDB's non-negative remainder for a positive modulus:
    # ((x % m) + m) % m
    x0 = f"({lam} - {lit(c['lam0'])} + {lit(PI)})"
    dlam = f"(((({x0} % {lit(2.0 * PI)}) + {lit(2.0 * PI)}) % {lit(2.0 * PI)}) - {lit(PI)})"
    theta = f"({lit(n)} * {dlam})"
    easting = f"({lit(c['e0'])} + {rho} * SIN({theta}))"
    northing = f"({lit(c['n0'] + c['rho0'])} - {rho} * COS({theta}))"
    return easting, northing
