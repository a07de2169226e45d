#!/usr/bin/env python
"""Per-query isolation bench (r7 optimization round; guide §1.4/§1.5).

NOT the frozen driver bench — `bench.py` stays the measured contract.
This harness times a chosen subset of entry queries with the same
methodology (one untimed cold pass, then median of N warm passes, noop
sink) without paying for the headline pipeline, and can dump
``.explain("formatted")`` plans for the plan-diff evidence in
OPTIMIZATION_r07.md / plans/r07/.

Usage:
  python bench_extra.py q1,q2,...            # time queries
  python bench_extra.py q1 --explain out.txt # capture formatted plan only
  BENCH_QUERY_RUNS=3 SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    query_runs = int(os.environ.get("BENCH_QUERY_RUNS", "3"))
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    explain_path = None
    if "--explain" in sys.argv:
        explain_path = sys.argv[sys.argv.index("--explain") + 1]

    from datacube_core_spark.session import get_spark

    spark = get_spark(
        app_name="dcs-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    unknown = [n for n in names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if explain_path:
        with open(explain_path, "w") as f:
            for name in names:
                df = qmap[name](spark, sf_dir)
                f.write(f"=== {name} ===\n")
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
                f.write("\n")
        print(f"wrote {explain_path}")
        spark.stop()
        return

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")

        def run_once() -> float:
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        cold[name] = round(run_once(), 3)
        timings[name] = round(statistics.median(run_once() for _ in range(query_runs)), 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "queries_cold": cold,
                      "total": round(sum(timings.values()), 3), "sf": sf_dir,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
