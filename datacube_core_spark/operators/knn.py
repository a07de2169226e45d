"""kNN over grid-cell rings with guaranteed-exact escalation.

The reference's PostGIS driver answers proximity queries with a GIST
spatial index (SURVEY §2.3 "PostGIS spatial-index join" row); our
replacement is the cell-ring pattern: explode each query point to the
tiles within Chebyshev ring radius ``r``, equi-join pages on the tile id,
rank by distance within the query partition (SURVEY §2.5/§2.6: kNN =
``Window.orderBy(dist).row_number() <= k``).

Correctness guarantee: a page outside ring ``r`` of the query's tile is at
coordinate distance ≥ r·tile_size, so once the k-th candidate's distance is
≤ r·tile_size the answer is exact.  Queries that fail the guarantee are
re-run with doubled radius (driver-side loop over the shrinking remainder —
each pass is one distributed job, never a per-row loop).

Determinism: ties broken by (dist_sq, doc_id) — row-for-row reproducible
and oracle-checkable (squared distance avoids sqrt and is bit-identical
between Spark and DuckDB on the same doubles).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from .tiling import point_tile_cols


def _ring_offsets(spark, r: int) -> DataFrame:
    """All (dx, dy) with Chebyshev norm ≤ r."""
    offs = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]
    return spark.createDataFrame(offs, "dx INT, dy INT")


def knn_join(
    pages_df: DataFrame,
    queries_df: DataFrame,
    grid: GridSpec,
    k: int = 5,
    r0: int = 1,
    id_col: str = "doc_id",
    query_id_col: str = "qid",
    max_r: int = 64,
    broadcast_queries: bool = True,
) -> DataFrame:
    """k nearest pages for each query point, with per-query exactness.

    ``queries_df``: (qid, lon, lat).  Returns (qid, doc_id, dist_sq, rank,
    exact).  ``exact=True`` rows carry the ring-escalation guarantee;
    ``exact=False`` marks queries resolved only by hitting ``max_r``
    (ring exhausted before the k-th candidate fell inside the guaranteed
    radius — results may be incomplete or non-minimal), so callers can
    distinguish guaranteed answers from truncated ones instead of
    silently trusting them.  A query whose ``max_r`` ring holds ZERO
    pages still emits one marker row (null doc_id/dist_sq/rank,
    exact=False) — no query ever silently disappears from the output.

    ``broadcast_queries=True`` (default) broadcasts the exploded query
    ring — right for a small query set.  ``False`` switches to a shuffle
    equi-join on the tile id (both sides repartition on (ptx, pty)) — the
    bulk-kNN / kNN-self-join path where queries are as numerous as pages;
    AQE handles skewed tiles.
    """
    spark = pages_df.sparkSession
    size = min(abs(grid.tile_size[0]), abs(grid.tile_size[1]))

    tx, ty = point_tile_cols(grid, F.col("lon"), F.col("lat"))
    pages_t = pages_df.select(id_col, "lon", "lat").withColumn("ptx", tx).withColumn("pty", ty)

    qtx, qty = point_tile_cols(grid, F.col("q_lon"), F.col("q_lat"))
    pending = (
        queries_df.select(
            F.col(query_id_col).alias("qid"),
            F.col("lon").alias("q_lon"),
            F.col("lat").alias("q_lat"),
        )
        .withColumn("qtx", qtx)
        .withColumn("qty", qty)
    )

    results = None
    r = r0
    while True:
        ring = _ring_offsets(spark, r)
        cand_tiles = (
            pending.crossJoin(F.broadcast(ring))
            .select("qid", "q_lon", "q_lat", (F.col("qtx") + F.col("dx")).alias("ptx"), (F.col("qty") + F.col("dy")).alias("pty"))
        )
        dlon = F.col("lon") - F.col("q_lon")
        dlat = F.col("lat") - F.col("q_lat")
        right = F.broadcast(cand_tiles) if broadcast_queries else cand_tiles
        cand = (
            pages_t.join(right, on=["ptx", "pty"], how="inner")
            .withColumn("dist_sq", dlon * dlon + dlat * dlat)
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist_sq").asc(), F.col(id_col).asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", id_col, "dist_sq", "rank")
        )

        guarantee = float(r * size) ** 2
        stats = topk.groupBy("qid").agg(F.count("*").alias("n"), F.max("dist_sq").alias("maxd"))
        # strict <: a tie exactly at the ring boundary could hide an
        # equal-distance, lower-id page just outside the ring
        guaranteed = F.col("n") >= k
        guaranteed = guaranteed & (F.col("maxd") < F.lit(guarantee))
        exhausted = r >= max_r
        if exhausted:
            # everything still pending resolves now; rows that fail the
            # guarantee are flagged exact=False rather than silently kept.
            # Left-join the PENDING set (not just stats): a query whose
            # max_r ring contains zero pages has no topk/stats row at all —
            # it must still surface as an explicit exact=False marker row
            # (null doc_id/dist/rank) instead of silently vanishing.
            pend_stats = pending.select("qid").join(stats, on="qid", how="left")
            resolved_q = pend_stats.select(
                "qid", F.coalesce(guaranteed, F.lit(False)).alias("exact")
            )
            id_type = dict(pages_t.dtypes)[id_col]
            empty_marks = pend_stats.where(F.col("n").isNull()).select(
                "qid",
                F.lit(None).cast(id_type).alias(id_col),
                F.lit(None).cast("double").alias("dist_sq"),
                F.lit(None).cast("int").alias("rank"),
                F.lit(False).alias("exact"),
            )
        else:
            resolved_q = stats.where(guaranteed).select("qid", F.lit(True).alias("exact"))
            empty_marks = None

        # resolved_q has ONE ROW PER QUERY.  In bulk/shuffle mode
        # (broadcast_queries=False — queries as numerous as pages) a
        # broadcast hint here would force an O(|queries|) collect onto the
        # driver every escalation round, exactly the OOM the shuffle mode
        # exists to avoid.  Hint only in broadcast mode; otherwise plain
        # joins let AQE pick the strategy from runtime sizes.
        resolved_side = F.broadcast(resolved_q) if broadcast_queries else resolved_q
        batch = topk.join(resolved_side, on="qid", how="inner")
        if empty_marks is not None:
            batch = batch.unionByName(empty_marks)
        # CHECKPOINT each round's outputs (measured, PERF.md §15): without
        # it, round k's pending is an anti-join CHAIN of depth k over the
        # ring-join, and the per-round emptiness probe + the final action
        # recompute every prior round's join — O(R²) heavy joins; a 100k-
        # query bulk run took 505 s where the checkpointed loop takes ~9 s.
        # Eager checkpoint = one materialization per round, after which the
        # probe reads cached rows and the final union is recompute-free.
        batch = batch.localCheckpoint(eager=True)
        results = batch if results is None else results.unionByName(batch)

        pending = pending.join(resolved_side, on="qid", how="left_anti").localCheckpoint(eager=True)
        if exhausted or len(pending.take(1)) == 0:
            break
        r *= 2

    return results
