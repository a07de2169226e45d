"""Grouped quantiles: exact rank path + constant-state histogram path.

Percentiles (p50/p95/p99 of page length, token count, fetch latency)
are the other classic 100-TB aggregate beside COUNT(DISTINCT): the
textbook implementation sorts every group (or collects it into one
executor — Spark's ``percentile`` builds a per-group value buffer), so
a hot group is a memory wall exactly like exact-distinct was before
``operators/sketch``.  Two paths, one contract:

* :func:`group_quantiles_exact` — TYPE-1 (lower) quantile by rank:
  the q-quantile of n values is the value at rank ⌈q·n⌉ in sort order.
  Ranks come from one window per group (a sort shuffle, work ∝ rows);
  the rank target is EXACT integer arithmetic — q is carried as a
  rational (num, den) and r = (num·n + den − 1) div den — so engines
  agree without a single float.  The VALUE at a rank is well-defined
  under ties (any tie-order yields the same value), which is what makes
  type-1 cross-engine-exact where interpolating quantiles (type 7,
  ``percentile_cont``) would hinge on float interpolation order.
* :func:`group_quantiles_hist` — fixed-bin histogram: values bin by
  integer division, groupBy(group, bin).count is ONE partial-agg
  shuffle (map-side combine), per-group state is ≤ n_bins rows forever,
  and the quantile is the lower bound of the bin containing rank r
  (cum ≥ r ∧ cum − c < r).  With bin_width = 1 on integer values this
  EQUALS the exact path (the equivalence test + the oracle entry pin
  that); wider bins trade resolution for state, never correctness of
  the bin bound.

Scale shape: the exact path is for bounded groups (it sorts within
groups); the histogram path is the web-scale default — same pattern as
HLL (:mod:`.sketch`): constant per-group state, hot groups cost what
cold ones do.  Reference analog: ODC's summary statistics stay
mean/min/max (``datacube/api/grid_workflow.py`` products carry no
percentile machinery) — this is webtext-extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default quantile set: (label_num, den) rationals
DEFAULT_QS = ((25, 100), (50, 100), (90, 100), (99, 100))


def _q_explode(qs) -> "F.Column":
    """Literal array<struct<q_num, q_den>> exploded — a narrow |qs|-way
    row expansion, NOT a join (keeps the plan cartesian-free)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(n)).cast("long").alias("q_num"),
                    F.lit(int(d)).cast("long").alias("q_den"),
                )
                for n, d in qs
            ]
        )
    )


def group_quantiles_exact(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    qs=DEFAULT_QS,
) -> DataFrame:
    """(group..., q_num, q_den, val): type-1 quantile per group per q."""
    gc = list(group_cols)
    w_rank = Window.partitionBy(*gc).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*gc)
    ranked = (
        # NULL values are ignored (SQL percentile semantics) — also the
        # cross-engine guard: Spark asc() sorts NULLS FIRST, DuckDB
        # defaults NULLS LAST, so a NULL reaching the window would
        # diverge the twins
        df.select(*gc, value_col)
        .where(F.col(value_col).isNotNull())
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("q", _q_explode(qs))
        .select(*gc, value_col, "rn", "n", "q.q_num", "q.q_den")
    )
    r = F.expr("CAST((q_num * n + q_den - 1) DIV q_den AS BIGINT)")
    return ranked.where(F.col("rn") == r).select(
        *gc, "q_num", "q_den", F.col(value_col).alias("val")
    )


def group_quantiles_hist(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    qs=DEFAULT_QS,
    bin_width: int = 1,
    bin_origin: int = 0,
) -> DataFrame:
    """(group..., q_num, q_den, val): histogram-bin lower bound of the
    bin containing rank ⌈q·n⌉.  ``value_col`` must be integral and
    ≥ bin_origin (DIV flooring).  Equals the exact path at
    bin_width = 1."""
    counts = quantile_bin_counts(df, group_cols, value_col, bin_width, bin_origin)
    return quantiles_from_bins(counts, group_cols, qs, bin_width, bin_origin)


def quantile_bin_counts(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    bin_width: int = 1,
    bin_origin: int = 0,
) -> DataFrame:
    """(group..., bin, c) bin counts — ONE definition shared by the
    batch path and the streaming sink (``streaming/jobs.
    streaming_quantile_bins``), so a binning change cannot silently
    diverge them.  NULL values excluded (the exact path's policy)."""
    gc = list(group_cols)
    b = F.expr(
        f"CAST((CAST({value_col} AS BIGINT) - {int(bin_origin)})"
        f" DIV {int(bin_width)} AS BIGINT)"
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*gc, b.alias("bin"))
        .groupBy(*gc, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantiles_from_bins(
    counts: DataFrame,
    group_cols: tuple[str, ...],
    qs=DEFAULT_QS,
    bin_width: int = 1,
    bin_origin: int = 0,
) -> DataFrame:
    """Rank-selection fold over a (group..., bin, c) bin-count table —
    the read-time half, reusable over an incrementally maintained bin
    sink (``streaming/jobs.streaming_quantile_bins``)."""
    gc = list(group_cols)
    w_cum = (
        Window.partitionBy(*gc)
        .orderBy(F.col("bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gc)
    cum = (
        counts.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_all))
        .withColumn("q", _q_explode(qs))
        .select(*gc, "bin", "c", "cum", "n", "q.q_num", "q.q_den")
    )
    r = F.expr("CAST((q_num * n + q_den - 1) DIV q_den AS BIGINT)")
    picked = cum.where((F.col("cum") >= r) & (F.col("cum") - F.col("c") < r))
    val = (F.col("bin") * int(bin_width) + int(bin_origin)).cast("long")
    return picked.select(*gc, "q_num", "q_den", val.alias("val"))


def _sql_qs_values(qs) -> str:
    rows = ", ".join(f"({int(n)}, {int(d)})" for n, d in qs)
    return f"(VALUES {rows}) AS qt(q_num, q_den)"


def sql_group_quantiles_exact(
    rows_cte: str,
    group_cols: tuple[str, ...],
    value_expr: str,
    qs=DEFAULT_QS,
) -> str:
    """DuckDB twin of the exact path (tiny VALUES cross join replaces the
    literal-array explode; rank arithmetic identical)."""
    gc = ", ".join(group_cols)
    return f"""SELECT {gc}, q_num, q_den, val FROM (
  SELECT {gc}, q_num, q_den, v AS val, rn,
         CAST((q_num * n + q_den - 1) // q_den AS BIGINT) AS r
  FROM (
    SELECT {gc}, {value_expr} AS v,
           ROW_NUMBER() OVER (PARTITION BY {gc} ORDER BY {value_expr}) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY {gc}) AS BIGINT) AS n
    FROM {rows_cte} WHERE {value_expr} IS NOT NULL
  ) CROSS JOIN {_sql_qs_values(qs)}
) WHERE rn = r"""


def sql_group_quantiles_hist(
    rows_cte: str,
    group_cols: tuple[str, ...],
    value_expr: str,
    qs=DEFAULT_QS,
    bin_width: int = 1,
    bin_origin: int = 0,
) -> str:
    gc = ", ".join(group_cols)
    return f"""SELECT {gc}, q_num, q_den,
       CAST(bin * {int(bin_width)} + {int(bin_origin)} AS BIGINT) AS val
FROM (
  SELECT {gc}, bin, c, cum, n, q_num, q_den,
         CAST((q_num * n + q_den - 1) // q_den AS BIGINT) AS r
  FROM (
    SELECT {gc}, bin, c,
           CAST(SUM(c) OVER (PARTITION BY {gc} ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY {gc}) AS BIGINT) AS n
    FROM (
      SELECT {gc},
             (CAST({value_expr} AS BIGINT) - {int(bin_origin)}) // {int(bin_width)} AS bin,
             COUNT(*) AS c
      FROM {rows_cte} WHERE {value_expr} IS NOT NULL GROUP BY {gc}, bin
    )
  ) CROSS JOIN {_sql_qs_values(qs)}
) WHERE cum >= r AND cum - c < r"""
