"""Ellipsoidal Lambert Conformal Conic (2SP) — EPSG:3112 / EPSG:2154.

Completes the SURVEY §2.8 conic-CRS family (VERDICT r5 "what's missing"
#2 named Albers AND LCC): EPSG:3112 (GDA94 / Geoscience Australia
Lambert — the national continental grid) and EPSG:2154 (RGF93 /
Lambert-93 — the legal projection of France, one of the most-used LCC
deployments anywhere).  Pure published math (Snyder 1987, pp. 104-110,
eqs. 15-1..15-11 + the conformal-latitude series 3-5), registered on the
same ``register_transform`` seam as Mercator/sinusoidal/UTM/Albers.

Forward (ellipsoid a, e; standard parallels φ₁, φ₂; origin φ₀, λ₀):

    m(φ) = cos φ / √(1 − e² sin²φ)
    t(φ) = tan(π/4 − φ/2) / [(1 − e sinφ)/(1 + e sinφ)]^{e/2}
    n  = (ln m₁ − ln m₂) / (ln t₁ − ln t₂)
    F  = m₁ / (n·t₁ⁿ)          ρ(φ) = a·F·tⁿ          θ = n(λ − λ₀)
    E = E₀ + ρ sinθ             N = N₀ + ρ₀ − ρ cosθ

Like the Albers module, the SIGNED formulation carries n's sign through
ρ/ρ₀/θ so southern-parallel grids (EPSG:3112, n < 0) need no special
casing.  Inverse: t = (ρ/(aF))^{1/n}, conformal latitude
χ = π/2 − 2·atan(t), then the published χ→φ series plus two fixed
Newton polish steps on t(φ) for nanometre round-trips.

Validation (tests/test_lcc.py) is by INDEPENDENT structure: conformality
itself (the local scale factor must be ISOTROPIC — a property Albers
provably lacks, so the test distinguishes the two families), unit scale
along both standard parallels, the spherical closed form in the f→0
limit, round-trips, and numpy/Catalyst/DuckDB dialect fuzz-twins.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

A_GRS80 = 6378137.0
F_GRS80 = 1.0 / 298.257222101
PI = 3.141592653589793

# EPSG code → (a, f, φ1°, φ2°, φ0°, λ0°, E0, N0)
LCC_PARAMS: Dict[str, Tuple[float, float, float, float, float, float, float, float]] = {
    "EPSG:3112": (A_GRS80, F_GRS80, -18.0, -36.0, 0.0, 134.0, 0.0, 0.0),
    "EPSG:2154": (A_GRS80, F_GRS80, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
}


def _t_scalar(phi: float, e: float) -> float:
    s = math.sin(phi)
    return math.tan(PI / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _m_scalar(phi: float, e2: float) -> float:
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - e2 * s * s)


def lcc_constants(crs: str) -> dict:
    return lcc_constants_from(*LCC_PARAMS[crs.strip().upper()])


def lcc_constants_from(
    a: float, f: float, phi1d: float, phi2d: float,
    phi0d: float, lam0d: float, e0: float, n0: float,
) -> dict:
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p1, p2, p0 = (math.radians(p) for p in (phi1d, phi2d, phi0d))
    m1, m2 = _m_scalar(p1, e2), _m_scalar(p2, e2)
    t1, t2, t0 = _t_scalar(p1, e), _t_scalar(p2, e), _t_scalar(p0, e)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    big_f = m1 / (n * t1**n)
    rho0 = a * big_f * t0**n
    # conformal→geodetic series (Snyder 3-5)
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    ser = (
        e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        4279.0 * e8 / 161280.0,
    )
    return {
        "a": a, "e": e, "e2": e2, "n": n, "F": big_f, "rho0": rho0,
        "aF": a * big_f, "lam0": math.radians(lam0d), "e0": e0, "n0": n0,
        "series": ser,
    }


_CONST = {crs: lcc_constants(crs) for crs in LCC_PARAMS}


def lcc_forward(lon, lat, crs: str) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized forward (degrees → metres)."""
    return lcc_forward_c(lon, lat, _CONST[crs.strip().upper()])


def lcc_forward_c(lon, lat, c: dict) -> Tuple[np.ndarray, np.ndarray]:
    e, n = c["e"], c["n"]
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.tan(PI / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
    # t^n via exp(n·ln t): the association the Catalyst/SQL dialects use
    # (errstate: t = 0 at the projection pole — log(0) → ∓inf → rho 0 or
    # +inf, both the mathematically correct limit, no warning needed)
    with np.errstate(divide="ignore"):
        rho = c["aF"] * np.exp(n * np.log(t))
    dlam = np.remainder(lam - c["lam0"] + PI, 2.0 * PI) - PI
    theta = n * dlam
    return c["e0"] + rho * np.sin(theta), c["n0"] + c["rho0"] - rho * np.cos(theta)


def lcc_inverse(x, y, crs: str) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse (metres → degrees)."""
    return lcc_inverse_c(x, y, _CONST[crs.strip().upper()])


def lcc_inverse_c(x, y, c: dict) -> Tuple[np.ndarray, np.ndarray]:
    e, n = c["e"], c["n"]
    xp = np.asarray(x, dtype=np.float64) - c["e0"]
    yp = c["rho0"] - (np.asarray(y, dtype=np.float64) - c["n0"])
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.sqrt(xp * xp + yp * yp)
    theta = np.arctan2(sgn * xp, sgn * yp)
    with np.errstate(divide="ignore", over="ignore"):
        t = np.exp(np.log(rho / c["aF"]) / n)
    chi = PI / 2.0 - 2.0 * np.arctan(t)
    a1, a2, a3, a4 = c["series"]
    phi = chi + a1 * np.sin(2 * chi) + a2 * np.sin(4 * chi) + a3 * np.sin(6 * chi) + a4 * np.sin(8 * chi)
    # apex guard: at (or within float-rounding distance of) the cone apex
    # rho→0 drives t toward 0 (n>0) or +inf (n<0) — the Newton step below
    # then computes inf−inf / divides by cos(φ)→0 and returns NaN/junk.
    # For those points the series estimate IS the answer (|χ| is within
    # ~1e-12 rad of the pole, far below the series' own error), so skip
    # the polish there rather than corrupt it.
    at_apex = ~np.isfinite(t) | (t <= 1e-12) | (t >= 1e12)
    phi_series = phi
    t_safe = np.where(at_apex, 1.0, t)
    # two Newton polish steps on f(φ) = t(φ) − t, using the closed-form
    # derivative dt/dφ = −t·(1−e²) / ((1−e²sin²φ)·cosφ)
    # (errstate: at_apex lanes may still divide by an underflowed dtdphi —
    # their values are discarded by the np.where below)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        for _ in range(2):
            s = np.sin(phi)
            tphi = np.tan(PI / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
            dtdphi = -tphi * (1.0 - c["e2"]) / ((1.0 - c["e2"] * s * s) * np.where(at_apex, 1.0, np.cos(phi)))
            phi = phi - (tphi - t_safe) / dtdphi
    phi = np.where(at_apex, phi_series, phi)
    lam = c["lam0"] + theta / n
    lon = np.rad2deg(np.remainder(lam + PI, 2.0 * PI) - PI)
    return lon, np.rad2deg(phi)


def lcc_transforms(crs: str):
    """(fwd, inv) lon/lat ↔ this LCC CRS, or None — the ``_resolve_lazy``
    hook shape, same contract as utm_transforms/albers_transforms."""
    key = crs.strip().upper()
    if key not in LCC_PARAMS:
        return None

    def fwd(lon, lat, _k=key):
        return lcc_forward(lon, lat, _k)

    def inv(x, y, _k=key):
        return lcc_inverse(x, y, _k)

    return fwd, inv


# ---------------------------------------------------------------------------
# Catalyst columns — same operation order as numpy
# ---------------------------------------------------------------------------


def lcc_cols(lon_col, lat_col, crs: str):
    """(easting, northing) Catalyst expressions — loop-free, pure JVM
    whole-stage codegen (tan/log/exp/sin/cos/pow-as-exp-log only)."""
    from pyspark.sql import functions as F

    c = _CONST[crs.strip().upper()]
    e, n = c["e"], c["n"]
    phi = lat_col * F.lit(PI / 180.0)
    s = F.sin(phi)
    # ((1−es)/(1+es))^(e/2) via exp((e/2)·ln(…)) — every engine has these
    half_pow = F.exp(F.lit(e / 2.0) * F.log((F.lit(1.0) - F.lit(e) * s) / (F.lit(1.0) + F.lit(e) * s)))
    t = F.tan(F.lit(PI / 4.0) - phi / F.lit(2.0)) / half_pow
    rho = F.lit(c["aF"]) * F.exp(F.lit(n) * F.log(t))
    lam = lon_col * F.lit(PI / 180.0)
    dlam = F.pmod(lam - F.lit(c["lam0"]) + F.lit(PI), F.lit(2.0 * PI)) - F.lit(PI)
    theta = F.lit(n) * dlam
    easting = F.lit(c["e0"]) + rho * F.sin(theta)
    northing = F.lit(c["n0"] + c["rho0"]) - rho * F.cos(theta)
    return easting, northing


# ---------------------------------------------------------------------------
# DuckDB SQL (oracle twin) — same operation order
# ---------------------------------------------------------------------------


def sql_lcc_exprs(lon: str, lat: str, crs: str) -> Tuple[str, str]:
    """(easting_sql, northing_sql) mirroring :func:`lcc_cols` term by
    term (compare floored/rounded — libm ulp differences only)."""
    c = _CONST[crs.strip().upper()]
    e, n = c["e"], c["n"]

    def lit(v: float) -> str:
        return f"CAST({float(v)!r} AS DOUBLE)"

    phi = f"({lat} * {lit(PI / 180.0)})"
    s = f"SIN({phi})"
    half_pow = f"EXP({lit(e / 2.0)} * LN(({lit(1.0)} - {lit(e)} * {s}) / ({lit(1.0)} + {lit(e)} * {s})))"
    t = f"(TAN({lit(PI / 4.0)} - {phi} / {lit(2.0)}) / {half_pow})"
    rho = f"({lit(c['aF'])} * EXP({lit(n)} * LN({t})))"
    lam = f"({lon} * {lit(PI / 180.0)})"
    x0 = f"({lam} - {lit(c['lam0'])} + {lit(PI)})"
    dlam = f"(((({x0} % {lit(2.0 * PI)}) + {lit(2.0 * PI)}) % {lit(2.0 * PI)}) - {lit(PI)})"
    theta = f"({lit(n)} * {dlam})"
    easting = f"({lit(c['e0'])} + {rho} * SIN({theta}))"
    northing = f"({lit(c['n0'] + c['rho0'])} - {rho} * COS({theta}))"
    return easting, northing
