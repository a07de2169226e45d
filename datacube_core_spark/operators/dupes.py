"""Duplicate detection with time leniency + range-overlap time buckets.

* :func:`duplicates_with_leniency` — reference
  ``drivers/postgres/_api.py:746-800``: rows matching on chosen fields
  whose timestamps fall within ±delta of each other count as duplicates
  (the reference merges tstzranges expanded by 500ms).  Spark shape:
  sessionize per group with a gap threshold — sort timestamps within the
  group, start a new cluster when the gap to the previous exceeds delta
  (window ``lag`` + running sum), then keep clusters of size > 1.

* :func:`range_bucket_join` — reference
  ``count_datasets_through_time`` (``_api.py:821-878``): generate period
  buckets (``generate_series`` → ``F.sequence``), join datasets whose
  [begin, end] range overlaps each bucket, count per bucket.  The
  range-overlap join explodes each row to the buckets it spans —
  equi-join after explode, never a theta-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def duplicates_with_leniency(
    df: DataFrame,
    match_fields: Sequence[str],
    ts_col: str = "warc_ts",
    leniency_ms: int = 500,
    id_col: str = "doc_id",
) -> DataFrame:
    """Groups of rows equal on ``match_fields`` whose timestamps chain
    within ``leniency_ms`` of the previous row (cluster = transitive
    closure, matching the reference's merged expanded ranges).

    Output: (match_fields..., cluster, n, ids sorted array).
    """
    w = Window.partitionBy(*match_fields).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    # cast: parquet TIMESTAMP_NTZ is not accepted by unix_millis (session
    # tz is UTC so the cast is wall-clock identity)
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    gap_ms = ts_ms - F.lag(ts_ms).over(w)
    new_cluster = F.when(gap_ms.isNull() | (gap_ms > F.lit(leniency_ms)), 1).otherwise(0)
    clustered = df.withColumn("_new", new_cluster).withColumn(
        "cluster", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        clustered.groupBy(*match_fields, "cluster")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("ids"),
        )
        .where(F.col("n") > 1)
    )


def archive_less_mature(
    df: DataFrame,
    match_fields: Sequence[str],
    ts_col: str = "warc_ts",
    leniency_ms: int = 500,
    id_col: str = "doc_id",
    flag_col: str = "archived",
    maturity_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Soft-archive less-mature duplicates arriving within the leniency
    window.

    Reference ``index/abstract.py:918-988`` (``find_less_mature``): when a
    dataset's key matches an existing one within ±delta, the **less
    mature** one is archived — maturity compares as strings with
    ``'final' < 'interim' < 'nrt'`` (reference comment "final" < "nrt" at
    ``abstract.py:979``), and equal maturity inside a match is an error
    (``abstract.py:970-975``).

    Batch shape: cluster rows by the gap rule (same chaining as
    :func:`duplicates_with_leniency`), then keep the first row of each
    cluster by ``(maturity asc, ts asc, id asc)`` — the most mature
    survives; without ``maturity_col`` the rule degrades to documented
    first-arrival-wins ``(ts, id)``.  With ``strict=True`` the reference's
    equal-maturity error is reproduced: any cluster holding two rows of
    the survivor's maturity raises ValueError.  Output = input columns +
    boolean ``flag_col``.
    """
    w = Window.partitionBy(*match_fields).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    gap_ms = ts_ms - F.lag(ts_ms).over(w)
    new_cluster = F.when(gap_ms.isNull() | (gap_ms > F.lit(leniency_ms)), 1).otherwise(0)
    clustered = df.withColumn("_new", new_cluster).withColumn(
        "_cluster", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    keep_order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    if maturity_col is not None:
        keep_order = [F.col(maturity_col).asc()] + keep_order
    wc = Window.partitionBy(*match_fields, "_cluster").orderBy(*keep_order)
    out = clustered.withColumn(flag_col, F.row_number().over(wc) > 1)
    if strict and maturity_col is not None:
        # a cluster is ambiguous when its two most-mature rows tie —
        # sorted maturity list has equal first two elements
        ambiguous = (
            clustered.groupBy(*match_fields, "_cluster")
            .agg(
                F.count("*").alias("_n"),
                F.sort_array(F.collect_list(F.col(maturity_col))).alias("_ms"),
            )
            .where((F.col("_n") > 1) & (F.element_at("_ms", 1) == F.element_at("_ms", 2)))
        )
        first = ambiguous.limit(1).collect()
        if first:
            raise ValueError(
                "equal-maturity duplicates within a leniency cluster "
                f"(reference abstract.py:970 raises): {first[0].asDict()}"
            )
    return out.drop("_new", "_cluster")


def range_bucket_join(
    df: DataFrame,
    begin_col: str,
    end_col: str,
    bucket_seconds: int,
    epoch: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """Count rows per time bucket where [begin, end] overlaps the bucket.

    Buckets are [k·step, (k+1)·step) from the epoch.  A row spans buckets
    floor(begin/step) .. floor(end/step) inclusive (closed range overlap
    with half-open buckets).  Explode + count: the reference's
    generate_series lateral join, relationally.
    """
    step = F.lit(bucket_seconds)
    b0 = F.floor(F.unix_timestamp(F.col(begin_col)) / step).cast("long")
    b1 = F.floor(F.unix_timestamp(F.col(end_col)) / step).cast("long")
    exploded = df.withColumn("bucket_idx", F.explode(F.sequence(b0, b1)))
    bucket_start = F.timestamp_seconds(F.col("bucket_idx") * step)
    return (
        exploded.groupBy("bucket_idx")
        .agg(F.count("*").alias("n"))
        .select(bucket_start.alias("bucket"), "n")
        .orderBy("bucket")
    )
