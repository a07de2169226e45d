"""Explicit skew handling for hot cells (salting + histogram sizing).

The pages corpus has deliberately skewed hot cells (dense URL clusters —
FIXTURES.md skew injection).  AQE's skew-join splitting covers joins, but
grouped aggregations over (tile_x, tile_y) can still bottleneck on a hot
reducer.  Two tools:

* :func:`cell_histogram` — cheap pre-pass: per-cell counts
  (``approx_count_distinct``-style sizing data; SURVEY §4 salt-factor
  choice comes from this histogram).
* :func:`salted_agg` — two-level aggregation: a salt column splits hot
  groups for the partial aggregate, then the final aggregate merges
  per-salt partials.  For algebraic aggregates (count/sum/min/max) the
  result is identical to the direct groupBy — verified against the plain
  plan (and Spark's own partial aggregation makes this a no-op win for
  simple counts; the operator matters for high-cardinality payload aggs
  like collect_list/distinct where map-side combine can't keep up).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "count": F.sum,  # partial counts merge by sum
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}

_PARTIALS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def cell_histogram(df: DataFrame, keys: Sequence[str] = ("tile_x", "tile_y")) -> DataFrame:
    return df.groupBy(*keys).agg(F.count("*").alias("n"))


def pick_salt_factor(hist: DataFrame, target_rows_per_task: int = 2_000_000) -> int:
    """Salt factor from the hottest cell: ceil(max_cell / target)."""
    mx = hist.agg(F.max("n").alias("m")).collect()[0]["m"] or 0
    return max(1, -(-int(mx) // target_rows_per_task))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, Tuple[str, str]],
    salt_factor: int,
    salt_on: str = None,
) -> DataFrame:
    """Two-level aggregation with salting.

    ``aggs``: {out_name: (col, fn)} with fn in count/sum/min/max.
    Salt = hash(salt_on or a rand-free row hash) % factor — deterministic
    (uses all non-key columns' hash so reruns are stable).
    """
    if salt_factor <= 1:
        exprs = [_PARTIALS[fn](c).alias(name) for name, (c, fn) in aggs.items()]
        return df.groupBy(*keys).agg(*exprs)

    salt_src = F.col(salt_on) if salt_on else F.hash(*[F.col(c) for c in df.columns if c not in keys])
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_factor)))

    partial_exprs = [_PARTIALS[fn](c).alias(f"_p_{name}") for name, (c, fn) in aggs.items()]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)

    final_exprs = [_MERGES[fn](F.col(f"_p_{name}")).alias(name) for name, (c, fn) in aggs.items()]
    return partial.groupBy(*keys).agg(*final_exprs)
