#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md sandbox proxy).

Runs the headline pipeline at two parallelism levels — local[8] and
local[32] (N and 4N cores) — on identical input, in separate JVMs
(Spark master is fixed per JVM), and reports throughput at both plus
efficiency = (T_8 / T_32) / 4.  Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--repl 400] [--runs 3]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, statistics, sys, time
sys.path.insert(0, os.environ["DCS_REPO"])
from pyspark.sql import functions as F
from datacube_core_spark.session import get_spark
from datacube_core_spark.geom import GRID_PAGES
from datacube_core_spark.operators.pip import PipIndex
from datacube_core_spark.operators.tiling import with_tile
from datacube_core_spark.sources.pages import pages
from datacube_core_spark.sources.regions import regions

cpus = int(os.environ["DCS_CPUS"])
repl = int(os.environ["DCS_REPL"])
runs = int(os.environ["DCS_RUNS"])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name=f"dcs-scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 16))
p = pages(spark, sf_dir, repl=repl)
n_pages = p.count()
index = PipIndex(spark, regions(spark), GRID_PAGES)

def headline():
    joined = index.join(p, keep_cols=["doc_id"])
    agg = with_tile(joined, GRID_PAGES).groupBy("tile_x", "tile_y", "region_id").agg(F.count("*").alias("n"))
    return agg.count()

headline()  # warm-up: JIT + python workers (executors are long-lived on a real cluster)
samples = []
for _ in range(runs):
    t0 = time.perf_counter(); headline(); samples.append(time.perf_counter() - t0)
sec = statistics.median(samples)
print(json.dumps({"cpus": cpus, "pages": n_pages, "sec": round(sec, 3),
                  "rows_per_sec": round(n_pages / sec, 1),
                  "samples": [round(s, 3) for s in samples]}))
spark.stop()
"""


def run_level(cpus: int, repl: int, runs: int) -> dict:
    env = dict(os.environ, DCS_REPO=REPO, DCS_CPUS=str(cpus), DCS_REPL=str(repl), DCS_RUNS=str(runs))
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {cpus} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=400)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_level(args.low, args.repl, args.runs)
    hi = run_level(args.high, args.repl, args.runs)
    eff = (lo["sec"] / hi["sec"]) / (args.high / args.low)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling efficiency (sandbox proxy)

Protocol per BASELINE.md: same input, two parallelism levels in separate
JVMs; steady-state (1 warm-up + median of {args.runs} timed passes) of the
headline pipeline: pages → tile assignment → broadcast PIP join → exact
refine → groupBy(tile, region) count.

- date: {datetime.datetime.now(datetime.timezone.utc).isoformat()}
- input: {sf_dir}, pages = {hi["pages"]:,} (repl={args.repl})
- Spark: AQE on (coalesce + skewJoin), Arrow batched UDFs, broadcast joins

| parallelism | wall sec (median) | rows/sec | samples |
|---|---|---|---|
| local[{args.low}] (N) | {lo["sec"]} | {lo["rows_per_sec"]:,} | {lo["samples"]} |
| local[{args.high}] (4N) | {hi["sec"]} | {hi["rows_per_sec"]:,} | {hi["samples"]} |

**Scaling efficiency = (T_{args.low} / T_{args.high}) / {args.high // args.low} =
({lo["sec"]} / {hi["sec"]}) / {args.high // args.low} = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(json.dumps({"low": lo, "high": hi, "efficiency": round(eff, 3), "written": path}))


if __name__ == "__main__":
    main()
