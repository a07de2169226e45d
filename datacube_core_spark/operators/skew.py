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


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tie_col: str,
    n_salt: int = 16,
    desc: bool = True,
) -> DataFrame:
    """Skew-safe EXACT top-k per group (two-level truncation).

    The naive per-group top-k — one rank window per group — serializes a
    hot group onto one task (the same wall :func:`salted_agg` fixes for
    sums, but rank is not a partial aggregate so salting alone is
    wrong).  Two-level truncation restores exactness:

    1. rank within (group, salt) where salt = md5(tie_col) mod n_salt,
       keep k — a hot group's sort spreads over n_salt tasks;
    2. rank within group over the ≤ n_salt·k survivors, keep k — a
       bounded sort regardless of group size.

    Exact because any row in a group's true top-k is necessarily in the
    top-k of its own salt partition (dropping it would require k better
    rows in the SAME salt, which would also be better globally).
    Ordering is (order_col desc|asc, tie_col asc), NULLS LAST on every
    key in BOTH engines (Spark's bare asc() is NULLS FIRST, DuckDB's
    default is NULLS LAST — pinning it is what keeps the twins
    row-identical when order_col is NULL).  ``tie_col`` must be a
    UNIQUE, NON-NULL key (it is the tie-breaker; NULL tie keys would
    both rank nondeterministically among themselves and share one salt
    partition).

    Returns df columns + ``rank`` (1-based within group).  Scale shape:
    two window sorts, the first keyed (group, salt) with input-sized
    data, the second keyed (group) over ≤ n_salt·k rows per group.
    """
    from pyspark.sql import Window

    from .dedup import md5_h32_col

    gc = list(group_cols)
    oc = (
        F.col(order_col).desc_nulls_last()
        if desc
        else F.col(order_col).asc_nulls_last()
    )
    salt = (md5_h32_col(F.col(tie_col).cast("string")) % n_salt).alias("__salt")
    w1 = Window.partitionBy(*gc, "__salt").orderBy(oc, F.col(tie_col).asc_nulls_last())
    pruned = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*gc).orderBy(oc, F.col(tie_col).asc_nulls_last())
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def sql_topk_per_group(
    rows_cte: str,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tie_col: str,
    desc: bool = True,
) -> str:
    """DuckDB twin — deliberately the DIRECT single-window form (no
    salting): an independent formulation, so the oracle checks that the
    two-level truncation IS exact, not just self-consistent."""
    gc = ", ".join(group_cols)
    d = "DESC" if desc else "ASC"
    return f"""SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {gc}
    ORDER BY {order_col} {d} NULLS LAST, {tie_col} ASC NULLS LAST) AS rank
  FROM {rows_cte}
) WHERE rank <= {k}"""
