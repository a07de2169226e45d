"""Real S2 cell ids — cross-system spatial-index interop.

Closes the r4 "what's missing" #3 gap: the GridSpec(+subcell) lattice
gives this engine its own equi-join/ring algebra, but joining against an
EXTERNAL S2-keyed table (the common key for planet-scale point indexes)
needs the genuine S2 cell id bit layout.  This module implements the
published S2 geometry cell-id construction (s2geometry.io — public docs
and reference implementation semantics) from scratch, vectorized in
numpy:

  lat/lng → unit XYZ → cube face (0..5) → (u, v) face coords
  → quadratic (s, t) → 30-bit (i, j) → 64-bit Hilbert-curve cell id
  ``(face << 61) | (curve_position << 1) | 1``

Levels 0..30; a level-k id truncates the position to 2k bits and sets
the lsb marker at bit ``2(30−k)``.  The Hilbert traversal uses the
standard 4-bit lookup tables generated from the base orientation tables
(POS_TO_IJ / POS_TO_ORIENTATION with swap/invert masks).

Validation strategy (tests/test_s2.py) — no s2 library exists in the
sandbox, so the implementation is checked by INDEPENDENT structure, not
by itself: a second, table-free 2-bit recursive Hilbert walk must agree
with the lookup-table fast path; consecutive leaf ids on a face must be
(i, j)-adjacent (the defining Hilbert property); decode∘encode must
round-trip; parent/child containment must hold; and face/uv math is
checked against hand-derivable anchor points (cube face centers and
corners).

Reference parity note: the reference indexes spatial search through
PostGIS (``datacube/drivers/postgis/_spatial.py``); S2 ids give the same
"one integer key per point" contract expressed as a Spark column.
"""

from __future__ import annotations

import numpy as np
import pandas  # noqa: F401 — module-global so pandas_udf type hints resolve

MAX_LEVEL = 30
_LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

# base Hilbert orientation tables (published S2 constants)
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)
IJ_TO_POS = tuple(
    tuple(row.index(k) for k in range(4)) for row in POS_TO_IJ
)


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        r = POS_TO_IJ[orientation]
        for index in range(4):
            ij = r[index]
            init(
                level + 1,
                (i << 1) + (ij >> 1),
                (j << 1) + (ij & 1),
                orig_orientation,
                (pos << 2) + index,
                orientation ^ POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookups()


# ---------------------------------------------------------------------------
# lat/lng → face/(i, j)
# ---------------------------------------------------------------------------


def lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Cube face (0..5) + (u, v) face coordinates (published mapping:
    face = axis of the largest |component|, +3 when negative)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0, np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def uv_to_st(u):
    """S2's quadratic projection (the library default)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def st_to_ij(s):
    return np.clip(
        np.floor(np.asarray(s, dtype=np.float64) * (1 << MAX_LEVEL)).astype(np.int64),
        0,
        (1 << MAX_LEVEL) - 1,
    )


# ---------------------------------------------------------------------------
# (face, i, j) ↔ cell id — vectorized lookup-table Hilbert traversal
# ---------------------------------------------------------------------------


def fij_to_id(face, i, j):
    """Leaf (level-30) cell id from face + 30-bit (i, j)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face << 60
    bits = face & SWAP_MASK
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    # faces 4-5 overflow into the int64 sign bit — the standard SIGNED
    # interop representation (BigQuery's S2_CELLIDFROMPOINT does the
    # same); the bit pattern, not the sign, is the id
    return (n << 1) + 1


def id_to_fij(cell_id):
    """Leaf cell id → (face, i, j) (inverse lookup traversal).  Sign-safe:
    ids for faces 4-5 are negative int64s; shifts are arithmetic, so every
    extraction masks to the chunk width."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    face = (cell_id >> 61) & 7
    i = np.zeros_like(cell_id)
    j = np.zeros_like(cell_id)
    bits = face & SWAP_MASK
    for k in range(7, -1, -1):
        # top chunk carries only 2 bits per axis (30 = 7*4 + 2)
        nbits = 2 if k == 7 else _LOOKUP_BITS
        chunk = (cell_id >> (k * 2 * _LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)
        bits += chunk << 2
        bits = LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return face, i, j


# ---------------------------------------------------------------------------
# level algebra (the prefix-join toolkit)
# ---------------------------------------------------------------------------


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent_id(cell_id, level: int):
    """Ancestor at ``level`` (id may be leaf or any deeper level)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    new_lsb = np.int64(lsb_for_level(level))
    return (cell_id & -new_lsb) | new_lsb


def cell_level(cell_id):
    """Level of a cell id = 30 − (trailing-zero count)/2."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    # integer log2 of lsb via float64 is exact for 2^0..2^62
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - tz // 2


def range_min(cell_id):
    """Smallest leaf id contained in this cell (for BETWEEN joins)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    return cell_id - lsb + 1


def range_max(cell_id):
    """Largest leaf id contained in this cell."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    return cell_id + lsb - 1


def s2_cell_id(lon_deg, lat_deg, level: int = MAX_LEVEL):
    """Vectorized lat/lng → S2 cell id at ``level`` (the public API)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = lonlat_to_xyz(lon_deg, lat_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = fij_to_id(face, i, j)
    if level == MAX_LEVEL:
        return leaf
    return parent_id(leaf, level)


def s2_cell_center(cell_id):
    """Cell id (any level) → (lon, lat) of the cell center (degrees)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    # center leaf (i, j): decode the MIN leaf in range, then offset by
    # half the cell's ij extent
    face, i, j = id_to_fij(range_min(cell_id) | 1)
    # ij cell size at this level: lsb = 1 << (2*(30-k)) → size = 1<<(30-k)
    size = np.sqrt(lsb.astype(np.float64)).astype(np.int64)
    si = (i & ~(size - 1)) + size // 2
    sj = (j & ~(size - 1)) + size // 2
    s = (si.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (sj.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xe, ye, ze) in enumerate(
        [
            (lambda u, v: np.ones_like(u), lambda u, v: u, lambda u, v: v),
            (lambda u, v: -u, lambda u, v: np.ones_like(u), lambda u, v: v),
            (lambda u, v: -u, lambda u, v: -v, lambda u, v: np.ones_like(u)),
            (lambda u, v: -np.ones_like(u), lambda u, v: -v, lambda u, v: -u),
            (lambda u, v: v, lambda u, v: -np.ones_like(u), lambda u, v: -u),
            (lambda u, v: v, lambda u, v: u, lambda u, v: -np.ones_like(u)),
        ]
    ):
        m = face == f
        if m.any():
            x[m] = xe(u, v)[m]
            y[m] = ye(u, v)[m]
            z[m] = ze(u, v)[m]
    lon = np.rad2deg(np.arctan2(y, x))
    lat = np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def s2_token(cell_id):
    """Canonical S2 token: hex of the id with trailing zero nibbles
    stripped (the interop string format)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    out = []
    for cid in cell_id.ravel().tolist():
        h = format(cid & 0xFFFFFFFFFFFFFFFF, "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out).reshape(cell_id.shape)


# ---------------------------------------------------------------------------
# DuckDB SQL twin (driver oracle): the ENTIRE pipeline — face/uv CASEs,
# quadratic ST, and the 8-step Hilbert traversal as joins against the
# 1024-entry lookup table (1 << (2*LOOKUP_BITS + 2)) emitted as a VALUES list
# ---------------------------------------------------------------------------


def sql_s2_cells(level: int, lon: str = "lon", lat: str = "lat", src: str = "pages") -> str:
    """SQL producing (doc_id, s2_cell) from ``src(doc_id, lon, lat)`` —
    term-for-term mirror of :func:`s2_cell_id`.  The final ``n*2+1`` can
    overflow BIGINT for faces 4-5 (DuckDB raises instead of wrapping), so
    it runs in HUGEINT and wraps to the signed representation explicitly."""
    lut_vals = ",".join(
        f"({k},{int(v)})" for k, v in enumerate(LOOKUP_POS.tolist())
    )
    q = 1 << MAX_LEVEL
    lsb = lsb_for_level(level)
    steps = []
    prev = "h8"
    for k in range(7, -1, -1):
        cur = f"h{k}"
        steps.append(
            f"""{cur} AS (
  SELECT {prev}.doc_id,  {prev}.i, {prev}.j,
         ({prev}.n | ((CAST(l.v AS BIGINT) >> 2) << {k * 8})) AS n,
         (l.v & 3) AS b
  FROM {prev} JOIN lut l
    ON l.k = {prev}.b + ((({prev}.i >> {k * 4}) & 15) << 6) + ((({prev}.j >> {k * 4}) & 15) << 2)
)"""
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
lut(k, v) AS (VALUES {lut_vals}),
xyz AS (
  SELECT doc_id,
         COS(RADIANS({lat})) * COS(RADIANS({lon})) AS x,
         COS(RADIANS({lat})) * SIN(RADIANS({lon})) AS y,
         SIN(RADIANS({lat})) AS z
  FROM {src}
),
fc AS (
  SELECT doc_id, x, y, z,
         CASE WHEN ABS(x) >= ABS(y) AND ABS(x) >= ABS(z) THEN 0
              WHEN ABS(y) >= ABS(z) THEN 1 ELSE 2 END AS f0
  FROM xyz
),
fc2 AS (
  SELECT doc_id, x, y, z,
         CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
              THEN f0 + 3 ELSE f0 END AS face
  FROM fc
),
uv AS (
  SELECT doc_id, face,
         CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                   WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                   WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM fc2
),
h8 AS (
  SELECT doc_id,
         LEAST(GREATEST(CAST(FLOOR((CASE WHEN u >= 0 THEN 0.5 * SQRT(1.0 + 3.0 * u)
                                         ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * u) END) * {q}.0) AS BIGINT), 0), {q - 1}) AS i,
         LEAST(GREATEST(CAST(FLOOR((CASE WHEN v >= 0 THEN 0.5 * SQRT(1.0 + 3.0 * v)
                                         ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * v) END) * {q}.0) AS BIGINT), 0), {q - 1}) AS j,
         (CAST(face AS BIGINT) << 60) AS n,
         CAST(face & 1 AS BIGINT) AS b
  FROM uv
),
{chain},
leaf AS (
  SELECT doc_id,
         CAST(CASE WHEN hh >= CAST(9223372036854775808 AS HUGEINT)
                   THEN hh - CAST(18446744073709551616 AS HUGEINT)
                   ELSE hh END AS BIGINT) AS id
  FROM (SELECT doc_id, CAST(n AS HUGEINT) * 2 + 1 AS hh FROM h0)
)
SELECT doc_id, ((id & -{lsb}) | {lsb}) AS s2_cell FROM leaf
"""


# ---------------------------------------------------------------------------
# independent slow path (validation only — no lookup tables)
# ---------------------------------------------------------------------------


def fij_to_id_slow(face: int, i: int, j: int) -> int:
    """Scalar 2-bit-per-step Hilbert walk from the orientation tables
    directly — shares NO code with the vectorized 4-bit lookup path, used
    by tests to cross-validate it."""
    pos = 0
    orientation = face & SWAP_MASK
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ij = bi * 2 + bj
        index = IJ_TO_POS[orientation][ij]
        pos = (pos << 2) + index
        orientation ^= POS_TO_ORIENTATION[index]
    v = (((face << 60) | pos) << 1) | 1
    # two's-complement wrap to match the numpy int64 representation
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def s2_cell_udf(level: int = MAX_LEVEL):
    """Arrow-vectorized pandas UDF (lon, lat) → LongType S2 cell id."""
    from pyspark.sql.functions import pandas_udf

    def f(lon: pandas.Series, lat: pandas.Series) -> pandas.Series:
        return pandas.Series(s2_cell_id(lon.to_numpy(), lat.to_numpy(), level))

    return pandas_udf(f, "long")


def with_s2_cell(df, level: int = MAX_LEVEL, lon_col: str = "lon", lat_col: str = "lat", out_col: str = "s2_cell"):
    """Append the S2 cell-id column — the drop-in interop key for joining
    against external S2-indexed tables (equi-join at matching level, or
    range_min/range_max BETWEEN joins across levels)."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, s2_cell_udf(level)(F.col(lon_col), F.col(lat_col)))
