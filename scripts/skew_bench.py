#!/usr/bin/env python
"""Pathological-skew benchmark: ALL rows in one grid cell.

Measures the grouped aggregation path under worst-case key skew:
  plain groupBy(cell).agg  vs  salted two-level (operators/skew.salted_agg)
for (a) algebraic aggs and (b) the array-payload fuser
(fuse_first_valid vs fuse_first_valid_salted).

Usage: python scripts/skew_bench.py [--rows 2000000] [--cpus 32]
Appends a results line to stdout (JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, runs=3):
    fn()
    xs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--fuse-rows", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datacube_core_spark.operators.grouping import (
        fuse_first_valid,
        fuse_first_valid_kernel,
        fuse_first_valid_salted,
    )
    from datacube_core_spark.operators.skew import salted_agg
    from datacube_core_spark.session import get_spark

    spark = get_spark(app_name="skew-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)

    # every row in ONE cell — the worst case a hot URL cluster can create
    df = (
        spark.range(0, args.rows, 1, args.cpus * 2)
        .select(
            F.lit(7).alias("tile_x"), F.lit(9).alias("tile_y"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )

    plain = timed(lambda: df.groupBy("tile_x", "tile_y").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("doc_id").alias("m")).count())
    salted = timed(lambda: salted_agg(
        df, ["tile_x", "tile_y"],
        {"n": ("doc_id", "count"), "s": ("v", "sum"), "m": ("doc_id", "max")},
        salt_factor=args.cpus).count())

    # fuser payload: one cell, many overlapping 64-px sources
    fdf = (
        spark.range(0, args.fuse_rows, 1, args.cpus * 2)
        .select(
            F.lit(0).alias("tx"), F.lit(0).alias("ty"),
            F.col("id").alias("id"), (F.col("id") % 97).cast("double").alias("sv"),
            F.transform(F.sequence(F.lit(1), F.lit(64)),
                        lambda i: F.when((i + F.col("id")) % 3 == 0, F.lit(-1.0)).otherwise(i.cast("double"))
                        ).alias("arr"),
        )
    )
    # consume the fused arrays (a bare count() lets Catalyst prune the
    # fold projection entirely)
    def _drain(df):
        return df.select(F.sum(F.aggregate("fused", F.lit(0.0), lambda a, x: a + x)).alias("s")).collect()

    fuse_plain = timed(lambda: _drain(fuse_first_valid(fdf, ["tx", "ty"], F.col("sv"), "id", "arr", -1.0)), runs=1)
    fuse_salted = timed(lambda: _drain(fuse_first_valid_salted(
        fdf, ["tx", "ty"], F.col("sv"), "id", "arr", -1.0, salt_factor=args.cpus)), runs=1)
    fuse_kernel = timed(lambda: _drain(fuse_first_valid_kernel(
        fdf, ["tx", "ty"], ["sv"], "id", "arr", -1.0)), runs=1)

    print(json.dumps({
        "rows": args.rows, "cpus": args.cpus,
        "algebraic": {"plain_groupby_sec": plain, "salted_sec": salted},
        "fuse_rows": args.fuse_rows,
        "fuser": {"plain_sec": fuse_plain, "salted_sec": fuse_salted, "kernel_sec": fuse_kernel},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
