"""MGRS (Military Grid Reference System) grid references over native UTM.

The string grid key NATO / USGS datasets ship with: ``31UDQ4825111932``
= UTM zone 31, latitude band U, 100 km square DQ, 1-metre easting and
northing digits within the square.  Published construction (NGA
standard, as implemented by GEOTRANS/mgrs libraries):

* **band**: 8° latitude bands ``C``..``X`` (I and O skipped) from -80°;
  band X extends to 84°.  Poleward of that is UPS, out of scope here —
  callers filter to the MGRS domain (the entry does).
* **100 km column letter**: easting / 100 km indexes an 8-letter run of
  ``A..Z`` minus I,O; the run starts at position ``8·((zone-1) mod 3)``
  — zones ≡1 use A–H, ≡2 J–R, ≡0 S–Z (eastings span 100 000–900 000 m,
  so ``col = floor(e/10⁵) − 1`` ∈ 0..7).
* **100 km row letter**: ``floor(n/10⁵)`` indexes the 20-letter cycle
  ``ABCDEFGHJKLMNPQRSTUV``, shifted by 5 for EVEN zones (the published
  even-zone offset); southern-hemisphere northings already carry the
  10 000 km false northing from the UTM forward.
* **digits**: ``floor(e) mod 10⁵`` / ``floor(n) mod 10⁵``, zero-padded
  to 5 (1-metre precision).

Everything after the UTM forward (:mod:`.tmerc`, native Krüger series)
is integer/string arithmetic — identical as Catalyst columns and DuckDB
SQL.  The floors inherit utm_project's cross-engine caveat: libm
transcendentals differ by ≤ a few ulp (sub-micrometre), so only a
coordinate astronomically close to a whole metre could flip a digit —
the same accepted bound the driver-green ``utm_project`` entry runs
under.

Reference analog: none in ODC (delegates CRS strings to pyproj);
interop-key family with geohash/quadkey/S2 (SURVEY §2.8 extension).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

BAND_LETTERS = "CDEFGHJKLMNPQRSTUVWX"       # 8° bands from -80°, I/O skipped
COL_LETTERS = "ABCDEFGHJKLMNPQRSTUVWXYZ"     # 24 = A..Z minus I, O
ROW_LETTERS = "ABCDEFGHJKLMNPQRSTUV"         # 20-letter northing cycle


def band_col(lat: Column) -> Column:
    """Latitude band letter; valid for lat ∈ [-80, 84) (band X covers
    72..84, hence the clamp to index 19)."""
    idx = F.least(F.floor((lat + F.lit(80.0)) / F.lit(8.0)), F.lit(19)).cast("int")
    return F.substring(F.lit(BAND_LETTERS), idx + 1, 1)


def mgrs_cols(zone: Column, lat: Column, easting: Column,
              northing: Column) -> dict:
    """MGRS components from staged UTM columns → dict of Columns:
    ``band``, ``sq`` (two-letter 100 km square), ``e5``/``n5`` (metre
    digits), ``mgrs`` (the full reference string)."""
    band = band_col(lat)
    e_fl = F.floor(easting)
    n_fl = F.floor(northing)
    col_start = ((zone - 1) % 3) * 8
    col_i = (e_fl / F.lit(100000)).cast("int") - 1
    col_letter = F.substring(F.lit(COL_LETTERS), (col_start + col_i + 1).cast("int"), 1)
    row_shift = F.when(zone % 2 == 0, F.lit(5)).otherwise(F.lit(0))
    row_i = ((n_fl / F.lit(100000)).cast("long") + row_shift) % 20
    row_letter = F.substring(F.lit(ROW_LETTERS), (row_i + 1).cast("int"), 1)
    sq = F.concat(col_letter, row_letter)
    e5 = F.lpad((e_fl % 100000).cast("string"), 5, "0")
    n5 = F.lpad((n_fl % 100000).cast("string"), 5, "0")
    mgrs = F.concat(zone.cast("string"), band, sq, e5, n5)
    return {"band": band, "sq": sq, "e5": e5, "n5": n5, "mgrs": mgrs}


def sql_mgrs_exprs(zone: str, lat: str, e: str, n: str) -> dict:
    """DuckDB twin of :func:`mgrs_cols` (same floors / index arithmetic;
    substr is 1-based in both engines)."""
    band = (
        f"substr('{BAND_LETTERS}', "
        f"CAST(LEAST(FLOOR(({lat} + 80.0) / 8.0), 19) AS INT) + 1, 1)"
    )
    e_fl = f"CAST(FLOOR({e}) AS BIGINT)"
    n_fl = f"CAST(FLOOR({n}) AS BIGINT)"
    col_letter = (
        f"substr('{COL_LETTERS}', "
        f"CAST((({zone} - 1) % 3) * 8 + ({e_fl} // 100000) - 1 + 1 AS INT), 1)"
    )
    row_letter = (
        f"substr('{ROW_LETTERS}', "
        f"CAST((({n_fl} // 100000) + (CASE WHEN {zone} % 2 = 0 THEN 5 ELSE 0 END)) % 20"
        f" + 1 AS INT), 1)"
    )
    sq = f"({col_letter} || {row_letter})"
    e5 = f"lpad(CAST({e_fl} % 100000 AS VARCHAR), 5, '0')"
    n5 = f"lpad(CAST({n_fl} % 100000 AS VARCHAR), 5, '0')"
    mgrs = f"(CAST({zone} AS VARCHAR) || {band} || {sq} || {e5} || {n5})"
    return {"band": band, "sq": sq, "e5": e5, "n5": n5, "mgrs": mgrs}


def _band_min_northings() -> list:
    """Minimum UTM northing per latitude band (20 ints), computed from
    THIS repo's own Krüger forward at the band's south edge on the
    central meridian, minus a 40 km slack for the zone-edge dip
    (southern-hemisphere northing at fixed lat is lower at zone edges —
    the dip is ≤ ~2 km even at 80°S; published implementations use the
    same anchor-minus-slack scheme).  Bands span ≤ 12° ≈ 1330 km, far
    under the 2000 km row-letter cycle, so the window
    [min_n, min_n + 2·10⁶) uniquely disambiguates any in-band point."""
    import numpy as np

    from .tmerc import E0_UTM, N0_NORTH, N0_SOUTH, tmerc_forward

    out = []
    for i in range(20):
        south = -80.0 + 8.0 * i
        n0 = N0_NORTH if south >= 0 else N0_SOUTH
        _, n = tmerc_forward(np.array([0.0]), np.array([south]), 0.0,
                             e0=E0_UTM, n0=n0)
        out.append(max(int(math.floor(float(n[0]))) - 40_000, 0))
    return out


BAND_MIN_N = _band_min_northings()
_ROW_CYCLE = 2_000_000


def parse_mgrs_cols(mgrs: Column) -> dict:
    """Inverse of :func:`mgrs_cols` as pure Catalyst: MGRS string →
    ``zone``, ``band``, and reconstructed 1 m ``easting``/``northing``
    integers (the floor values the forward emitted).  Northing's
    2000 km row-letter ambiguity resolves against the band's minimum
    northing (``BAND_MIN_N``).

    Contract: inputs must be well-formed 1 m references (what
    :func:`mgrs_cols` emits).  A malformed string yields arithmetic
    garbage, not an error — Catalyst expressions cannot raise
    per-row; validate untrusted inputs with
    ``regexp_like(mgrs, '^[0-9]{1,2}[A-Z]{3}[0-9]{10}$')`` first, or
    parse driver-side with :func:`py_parse_mgrs` (which raises)."""
    zone = F.regexp_extract(mgrs, r"^(\d+)", 1).cast("int")
    letters = F.regexp_extract(mgrs, r"^\d+([A-Z]{3})", 1)
    band = F.substring(letters, 1, 1)
    col_letter = F.substring(letters, 2, 1)
    row_letter = F.substring(letters, 3, 1)
    digits = F.regexp_extract(mgrs, r"([0-9]{10})$", 1)
    e5 = F.substring(digits, 1, 5).cast("long")
    n5 = F.substring(digits, 6, 5).cast("long")
    def _pos(letter: Column, alphabet: str) -> Column:
        # 1-based index of a single-char Column in a literal alphabet
        # (F.locate needs a literal substring, so use array_position)
        return F.array_position(F.array(*[F.lit(c) for c in alphabet]), letter)

    col_i = _pos(col_letter, COL_LETTERS).cast("long") - 1 \
        - ((zone - 1) % 3).cast("long") * 8
    easting = (col_i + 1) * 100000 + e5
    row_shift = F.when(zone % 2 == 0, F.lit(5)).otherwise(F.lit(0))
    row_i = (_pos(row_letter, ROW_LETTERS).cast("long") - 1
             - row_shift + 20) % 20
    raw = row_i * 100000 + n5
    band_i = _pos(band, BAND_LETTERS).cast("int") - 1
    min_n = F.element_at(F.array(*[F.lit(v) for v in BAND_MIN_N]), band_i + 1)
    k = F.greatest(
        F.floor((min_n - raw + F.lit(_ROW_CYCLE - 1)) / F.lit(float(_ROW_CYCLE))),
        F.lit(0),
    ).cast("long")
    northing = raw + k * _ROW_CYCLE
    return {"zone": zone, "band": band, "easting": easting, "northing": northing}


def sql_parse_mgrs_exprs(mgrs: str) -> dict:
    """DuckDB twin of :func:`parse_mgrs_cols` (same extraction and
    window arithmetic; strpos/locate are both 1-based)."""
    zone = f"CAST(regexp_extract({mgrs}, '^([0-9]+)', 1) AS INT)"
    letters = f"regexp_extract({mgrs}, '^[0-9]+([A-Z]{{3}})', 1)"
    band = f"substr({letters}, 1, 1)"
    col_letter = f"substr({letters}, 2, 1)"
    row_letter = f"substr({letters}, 3, 1)"
    digits = f"regexp_extract({mgrs}, '([0-9]{{10}})$', 1)"
    e5 = f"CAST(substr({digits}, 1, 5) AS BIGINT)"
    n5 = f"CAST(substr({digits}, 6, 5) AS BIGINT)"
    col_i = (
        f"(CAST(strpos('{COL_LETTERS}', {col_letter}) AS BIGINT) - 1"
        f" - CAST((({zone} - 1) % 3) AS BIGINT) * 8)"
    )
    easting = f"(({col_i} + 1) * 100000 + {e5})"
    row_i = (
        f"((CAST(strpos('{ROW_LETTERS}', {row_letter}) AS BIGINT) - 1"
        f" - (CASE WHEN {zone} % 2 = 0 THEN 5 ELSE 0 END) + 20) % 20)"
    )
    raw = f"({row_i} * 100000 + {n5})"
    mins = ", ".join(str(v) for v in BAND_MIN_N)
    min_n = (
        f"([{mins}])[CAST(strpos('{BAND_LETTERS}', {band}) AS INT)]"
    )
    k = (
        f"GREATEST(CAST(FLOOR(({min_n} - {raw} + {_ROW_CYCLE - 1})"
        f" / {float(_ROW_CYCLE)!r}) AS BIGINT), 0)"
    )
    northing = f"({raw} + {k} * {_ROW_CYCLE})"
    return {"zone": zone, "band": band, "easting": easting, "northing": northing}


def py_parse_mgrs(ref: str):
    """Python reference inverse → (zone, band, easting, northing)."""
    import re

    m = re.match(r"^(\d+)([A-Z])([A-Z])([A-Z])(\d{5})(\d{5})$", ref)
    if not m:
        raise ValueError(f"not a 1 m MGRS reference: {ref!r}")
    zone = int(m.group(1))
    band, col_letter, row_letter = m.group(2), m.group(3), m.group(4)
    e5, n5 = int(m.group(5)), int(m.group(6))
    col_i = COL_LETTERS.index(col_letter) - ((zone - 1) % 3) * 8
    easting = (col_i + 1) * 100000 + e5
    row_i = (ROW_LETTERS.index(row_letter) - (5 if zone % 2 == 0 else 0)) % 20
    raw = row_i * 100000 + n5
    min_n = BAND_MIN_N[BAND_LETTERS.index(band)]
    k = max(-(-(min_n - raw) // _ROW_CYCLE), 0)
    return zone, band, easting, raw + k * _ROW_CYCLE


def py_mgrs(lon: float, lat: float) -> str:
    """Python reference (numpy UTM forward + the same letter rules) —
    used by tests against published vectors and for fuzz parity."""
    import numpy as np

    from .tmerc import E0_UTM, N0_NORTH, N0_SOUTH, tmerc_forward, utm_lon0, utm_zone_of

    if not -80.0 <= lat < 84.0:
        raise ValueError("MGRS domain is lat in [-80, 84); beyond is UPS")
    zone = int(utm_zone_of(np.array([lon]))[0])
    n0 = N0_NORTH if lat >= 0 else N0_SOUTH
    e, n = tmerc_forward(np.array([lon]), np.array([lat]),
                         utm_lon0(zone), e0=E0_UTM, n0=n0)
    e_fl, n_fl = math.floor(float(e[0])), math.floor(float(n[0]))
    band = BAND_LETTERS[min(int(math.floor((lat + 80.0) / 8.0)), 19)]
    col = COL_LETTERS[((zone - 1) % 3) * 8 + e_fl // 100000 - 1]
    row = ROW_LETTERS[(n_fl // 100000 + (5 if zone % 2 == 0 else 0)) % 20]
    return f"{zone}{band}{col}{row}{e_fl % 100000:05d}{n_fl % 100000:05d}"
