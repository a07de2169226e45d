"""Distributed as-of join (nearest at-or-before / at-or-after match).

Spark has no as-of join; the naive encodings are a range join (quadratic
blow-up) or a per-key collect (driver bound).  This operator uses the
union + running-window construction: tag left and right rows, union them
on the key, sort by (ts, side) inside each key, and carry the most
recent right payload forward — every left row reads its match from the
scan.  ONE shuffle on the key, linear work, no join node at all.

Reference analog: the duplicate/time-leniency machinery is the closest
reference shape (``datacube/index/_datasets.py`` dedup windows); as-of
is the webtext counterpart (e.g. "state of user/domain at crawl time").
The DuckDB oracle twin is a genuinely independent check: DuckDB
implements a native ``ASOF JOIN`` and the entry compares row-for-row
against it.

Scale note (100 TB): the plain window partitions by key, so ONE hot key
= one task.  For skewed keys pass ``ts_bucket`` — rows are windowed
inside (key, bucket) partitions, per-bucket tails (the last right row of
each bucket) are prefix-scanned in a second window over ONE ROW PER
BUCKET per key, and every row coalesces its in-bucket match with the
carried-in tail of earlier buckets (bucket gaps bridged by the same
union+last construction at bucket granularity).  Two shuffles instead of
one, but the heavy window partitions are bounded by the bucket width, so
a pathological key can no longer pin a single executor.  Equivalence of
the two paths is pytest-asserted on a skewed synthetic
(tests/test_asof.py).

Semantics (``direction="backward"``): match the right row with the
largest ``right_ts`` ≤ ``left_ts`` for the same key; equal ts matches
(inclusive).  (key, right_ts) must be unique on the right — pre-aggregate
with ``max_by`` if it is not (the entry query does).
``direction="forward"`` matches the smallest ``right_ts`` ≥ ``left_ts``
and requires a NUMERIC ts (it runs the backward core on negated ts).
``tolerance`` (same units as ts; numeric ts only) nulls out matches
farther than ``tolerance`` from the left ts.  ``ts_bucket`` also
requires a numeric ts.

The match is ATOMIC: the scan carries one (ts, payload...) struct per
right row, so a matched row's payload NULLs are preserved as NULLs — a
per-column scan would instead splice non-null values from OLDER right
rows into the newest match (tests/test_asof.py::test_null_payload_atomic
pins this).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _LR, _M = "__asof_ts", "__asof_lr", "__asof_m"
_MT = "__t"  # match-struct ts field (payload columns keep their names)
# internal working columns — user columns with these names (or a __p_
# prefix) would be silently overwritten mid-plan, so they are rejected
_RESERVED = frozenset({_TS, _LR, _M, _MT, "__b", "__ib", "__c", "__ci", "__eb", "__glr"})


def _last(col, over):
    return F.last(col, ignorenulls=True).over(over)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    direction: str = "backward",
    tolerance: Optional[float] = None,
    ts_bucket: Optional[float] = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join; returns all left columns + ``payload`` columns +
    ``right_ts + suffix`` (the matched right ts, null when no match)."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    on = list(on)
    payload = list(payload)
    user_cols = set(on) | set(payload) | set(left.columns)
    bad = sorted(user_cols & _RESERVED | {c for c in user_cols if c.startswith("__p_")})
    if bad:
        raise ValueError(f"column names reserved by asof_join: {bad}")
    forward = direction == "forward"
    if forward:
        left = left.withColumn(left_ts, -F.col(left_ts))
        right = right.withColumn(right_ts, -F.col(right_ts))

    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    ts_type = ltypes[left_ts]
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_LR),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"__p_{c}") for c in payload],
    )
    r = right.select(
        *on,
        F.col(right_ts).cast(ts_type).alias(_TS),
        F.lit(0).alias(_LR),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    u = l.unionByName(r)
    # the atomic match value: ONE struct per right row (ts + payload), so
    # the scan can never mix fields from different right rows — a matched
    # row's payload NULLs stay NULL instead of falling through to an
    # older row's value (payload named _MT is caught by _RESERVED above)
    mval = F.when(
        F.col(_LR) == 0,
        F.struct(
            F.col(_TS).alias(_MT),
            *[F.col(f"__p_{c}").alias(c) for c in payload],
        ),
    )

    if ts_bucket is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_LR).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.select("*", _last(mval, w).alias(_M))
    else:
        u = u.withColumn("__b", F.floor(F.col(_TS) / F.lit(float(ts_bucket))))
        win = (
            Window.partitionBy(*on, "__b")
            .orderBy(F.col(_TS).asc(), F.col(_LR).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.select("*", _last(mval, win).alias("__ib"))
        # one row per (key, bucket) that contains right rows: the bucket's
        # tail (latest right row) — the prefix scan below runs over these
        # tiny per-key sequences, so a hot key costs O(#buckets), not O(rows)
        tails = (
            u.where(F.col(_LR) == 0)
            .groupBy(*on, "__b")
            .agg(F.max_by(mval, F.col(_TS)).alias("__c"))
        )
        ctype = tails.schema["__c"].dataType
        # carry-in for bucket b = scan of tails over buckets < b; bridge
        # bucket gaps with the same union+running-last trick at bucket
        # granularity: tail rows sort before bucket-marker rows of LATER
        # buckets via (__eb, __glr) where the tail of bucket b is stamped
        # __eb = b + 1 (its values become visible FROM the next bucket on).
        gvals = tails.select(
            *on,
            (F.col("__b") + 1).alias("__eb"),
            F.lit(0).alias("__glr"),
            F.col("__c"),
        )
        grows = (
            u.select(*on, "__b")
            .distinct()
            .select(
                *on,
                F.col("__b").alias("__eb"),
                F.lit(1).alias("__glr"),
                F.lit(None).cast(ctype).alias("__c"),
            )
        )
        gw = (
            Window.partitionBy(*on)
            .orderBy(F.col("__eb").asc(), F.col("__glr").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bridged = (
            grows.unionByName(gvals)
            .select(*on, "__eb", "__glr", _last(F.col("__c"), gw).alias("__ci"))
            .where(F.col("__glr") == 1)
            .select(*on, F.col("__eb").alias("__b"), "__ci")
        )
        u = u.join(bridged, on=on + ["__b"], how="left")
        out = u.select("*", F.coalesce(F.col("__ib"), F.col("__ci")).alias(_M))

    out = out.where(F.col(_LR) == 1)
    mts = F.col(_M)[_MT]
    keep = None if tolerance is None else (mts >= F.col(_TS) - F.lit(float(tolerance)))
    def _gate(col):
        return col if keep is None else F.when(keep, col)

    lts = -F.col(_TS) if forward else F.col(_TS)
    mts_out = _gate(-mts if forward else mts)
    return out.select(
        *on,
        lts.alias(left_ts),
        *[F.col(c) for c in lcols],
        *[_gate(F.col(_M)[c]).alias(c) for c in payload],
        mts_out.alias(right_ts + suffix),
    )
