#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: tiles+join-rows/sec over the flagship pipeline (tile
assignment + PIP join + per-(tile, region) agg), per BASELINE.json.
Steady-state protocol: one untimed warm-up pass (JVM JIT + Python UDF
worker spin-up — a real cluster's executors are long-lived), then the
median of BENCH_RUNS timed passes.

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores       (default 32)
  BENCH_REPL           page replication (default 200 -> 1M pages @ sf0.1)
  BENCH_RUNS           timed passes for the headline (default 3)
  BENCH_QUERIES        comma list to restrict which entry queries run
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repl = int(os.environ.get("BENCH_REPL", "200"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    only = os.environ.get("BENCH_QUERIES")

    from datacube_core_spark.session import get_spark

    spark = get_spark(
        app_name="dcs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )

    import __spark_entry__ as entry_mod
    from datacube_core_spark.geom import GRID_PAGES
    from datacube_core_spark.operators.pip import PipIndex
    from datacube_core_spark.operators.tiling import with_tile
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.sources.regions import regions

    timings: dict[str, float] = {}

    # --- headline: tile assignment + PIP join over replicated pages ------
    p = pages(spark, sf_dir, repl=repl)
    n_pages = p.count()
    index = PipIndex(spark, regions(spark), GRID_PAGES)

    def headline() -> int:
        joined = index.join(p, keep_cols=["doc_id"])
        agg = with_tile(joined, GRID_PAGES).groupBy("tile_x", "tile_y", "region_id").agg(
            F.count("*").alias("n")
        )
        return agg.count()

    out_rows = headline()  # warm-up (untimed)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        headline()
        samples.append(time.perf_counter() - t0)
    headline_sec = statistics.median(samples)
    throughput = n_pages / headline_sec
    timings["headline_tile_pip"] = round(headline_sec, 3)

    # --- per-query timings (single pass each; workers already warm) ------
    qmap = entry_mod.queries()
    names = [n for n in sorted(qmap) if (not only or n in only.split(","))]
    for name in names:
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "tiles+join-rows/sec (tile assignment + PIP join over synthetic pages)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "pages": n_pages,
                "rows_per_sec": round(throughput, 1),
                "headline_out_rows": out_rows,
                "headline_samples": [round(s, 3) for s in samples],
                "cpus": cpus,
                "repl": repl,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
