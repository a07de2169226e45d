"""Query layer: kwargs → Catalyst predicates (reference API parity).

Reproduces the reference's query parsing semantics:

* ``time_to_search_dims`` — reference ``datacube/api/query.py:306-344``:
  inclusive time ranges with period-end snapping ('2000' → [2000-01-01
  00:00:00, 2000-12-31 23:59:59.999999]) via ``pandas.Period.end_time``,
  open starts → epoch, open ends → today.
* ``Query`` — reference ``datacube/api/query.py:60-169``: spatial kwargs
  (x/y/lon/lat, 2-sequences → Range), time, product, plus arbitrary
  field terms; lowered to a single Catalyst predicate.
* predicate builders — reference ``drivers/postgres/_fields.py``:
  equality (``:520-530``), half-open value-between (``:477-493``),
  closed range-overlap (``:496-507``), range-contains (``:510-517``),
  OR-expression (``_api.py:501-507``).
* bitmask predicates — reference ``datacube/utils/masking.py:81-189``:
  ``make_mask`` flag matching compiles to ``(col & mask) == value``;
  nodata masks per ``:109-153``.
"""

from __future__ import annotations

import datetime
from collections import abc
from functools import reduce
from typing import Any, Dict, NamedTuple, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Range(NamedTuple):
    begin: Any
    end: Any


SPATIAL_KEYS = ("latitude", "lat", "y", "longitude", "lon", "long", "x")
OTHER_KEYS = ("measurements", "group_by", "output_crs", "resolution", "product", "geopolygon", "like", "crs")


def time_to_search_dims(time_range) -> Range:
    """Inclusive tz-naive-UTC time Range with pandas-Period end snapping."""
    tr_start, tr_end = time_range, time_range
    if hasattr(time_range, "__iter__") and not isinstance(time_range, str):
        tmp = list(time_range)
        if len(tmp) > 2:
            raise ValueError("Please supply start and end date only for time query")
        tr_start, tr_end = tmp[0], tmp[-1]

    if isinstance(tr_start, (int, float)) or isinstance(tr_end, (int, float)):
        raise TypeError("Time dimension must be provided as a datetime or a string")

    if tr_start is None:
        start = datetime.datetime.fromtimestamp(0)
    elif not isinstance(tr_start, datetime.datetime):
        if hasattr(tr_start, "isoformat"):
            tr_start = tr_start.isoformat()
        start = pd.to_datetime(tr_start).to_pydatetime()
    else:
        start = tr_start

    if tr_end is None:
        tr_end = datetime.datetime.now().strftime("%Y-%m-%d")
    if hasattr(tr_end, "isoformat"):
        tr_end = tr_end.isoformat()
    import warnings

    with warnings.catch_warnings():
        # Period.end_time is xxx.999999999ns; microsecond truncation is the
        # reference behavior (it suppresses the same warning)
        warnings.simplefilter("ignore", UserWarning)
        end = pd.Period(tr_end).end_time.to_pydatetime()

    return Range(start, end)


# ---------------------------------------------------------------------------
# predicate builders (the search-field algebra)
# ---------------------------------------------------------------------------

def eq_pred(col: Column, value) -> Column:
    return col == F.lit(value)


def value_between_pred(col: Column, lo, hi) -> Column:
    """Half-open: lo <= col < hi (the reference's ValueBetweenExpression)."""
    return (col >= F.lit(lo)) & (col < F.lit(hi))


def range_overlap_pred(lo_col: Column, hi_col: Column, q_lo, q_hi) -> Column:
    """Stored [lo, hi] range overlaps query range (tstzrange && analog,
    closed intervals)."""
    return (lo_col <= F.lit(q_hi)) & (F.lit(q_lo) <= hi_col)


def range_contains_pred(lo_col: Column, hi_col: Column, value) -> Column:
    return F.lit(value).between(lo_col, hi_col)


def or_preds(*preds: Column) -> Column:
    return reduce(lambda a, b: a | b, preds)


def time_overlap_pred(ts_col: Column, r: Range) -> Column:
    """Point timestamp within an inclusive Range (our pages have instant
    timestamps; dataset time-ranges would use range_overlap_pred)."""
    return ts_col.between(F.lit(r.begin), F.lit(r.end))


# ---------------------------------------------------------------------------
# bitmask predicates (masking)
# ---------------------------------------------------------------------------

def make_mask_pred(col: Column, mask: int, value: int) -> Column:
    """(col & mask) == value — multi-bit flag matching."""
    return col.bitwiseAND(F.lit(mask)) == F.lit(value)


def flags_to_mask_value(flag_defs: Dict[str, Dict], **flags) -> Tuple[int, int]:
    """Compile named flags to (mask, value) pairs.

    ``flag_defs``: {name: {"bits": int | [int], "values": {raw: meaning}}}
    — the reference's flag-definition documents
    (``utils/masking.py:156-189``)."""
    mask = 0
    value = 0
    for name, want in flags.items():
        d = flag_defs[name]
        bits = d["bits"]
        bits = bits if isinstance(bits, (list, tuple)) else [bits]
        field_mask = 0
        for b in bits:
            field_mask |= 1 << b
        # find raw value whose meaning matches `want`
        raw = None
        for rv, meaning in d["values"].items():
            if meaning == want or (isinstance(want, bool) and str(meaning).lower() == str(want).lower()):
                raw = int(rv)
                break
        if raw is None:
            raise ValueError(f"no value {want!r} for flag {name}")
        shift = min(bits)
        mask |= field_mask
        value |= (raw << shift) & field_mask
    return mask, value


def valid_data_mask(col: Column, nodata: Optional[float]) -> Column:
    """True where the value is valid (nodata-aware, NaN-aware)."""
    if nodata is None:
        return F.lit(True)
    import math

    if isinstance(nodata, float) and math.isnan(nodata):
        return ~F.isnan(col)
    return col != F.lit(nodata)


def mask_invalid_data(col: Column, nodata: Optional[float]) -> Column:
    """Replace nodata with NULL (the engine's NaN analog)."""
    return F.when(valid_data_mask(col, nodata), col)


# ---------------------------------------------------------------------------
# Query object
# ---------------------------------------------------------------------------

class Query:
    """Parsed query: spatial bbox + time range + field terms → predicate.

    Mirrors the reference Query's kwarg surface where it makes sense for a
    flat pages table (x/y/lon/lat 2-sequences, time, arbitrary equality or
    Range terms)."""

    def __init__(self, **kwargs):
        self.spatial: Dict[str, Range] = {}
        self.time: Optional[Range] = None
        self.terms: Dict[str, Any] = {}

        for key, value in kwargs.items():
            k = key.lower()
            if k in ("time", "t"):
                self.time = time_to_search_dims(value)
            elif k in ("x", "lon", "long", "longitude"):
                self.spatial["lon"] = Range(*value)
            elif k in ("y", "lat", "latitude"):
                self.spatial["lat"] = Range(*value)
            elif k in OTHER_KEYS:
                self.terms[k] = value
            elif (
                not isinstance(value, str)
                and isinstance(value, abc.Sequence)
                and len(value) == 2
            ):
                self.terms[key] = Range(*value)
            else:
                self.terms[key] = value

    def predicate(
        self,
        lon: str = "lon",
        lat: str = "lat",
        ts: str = "warc_ts",
    ) -> Column:
        preds = []
        if "lon" in self.spatial:
            r = self.spatial["lon"]
            preds.append(F.col(lon).between(F.lit(r.begin), F.lit(r.end)))
        if "lat" in self.spatial:
            r = self.spatial["lat"]
            preds.append(F.col(lat).between(F.lit(r.begin), F.lit(r.end)))
        if self.time is not None:
            preds.append(time_overlap_pred(F.col(ts), self.time))
        for k, v in self.terms.items():
            if k in OTHER_KEYS:
                continue
            if isinstance(v, Range):
                preds.append(F.col(k).between(F.lit(v.begin), F.lit(v.end)))
            else:
                preds.append(F.col(k) == F.lit(v))
        if not preds:
            return F.lit(True)
        return reduce(lambda a, b: a & b, preds)

    def apply(self, df: DataFrame, **cols) -> DataFrame:
        return df.where(self.predicate(**cols))
