#!/usr/bin/env python
"""Probe: exact bounded-BFS harmonic vs HyperBall sketch as radius grows.

The exact operator's cost is the REACHABLE PAIR SET (known-pairs table
grows toward n·|ball|); HyperBall's state is n·m sparse register rows no
matter the radius.  This probe measures both walls and the pair/row
counts on the same pages graph so PERF.md can state the crossover with
numbers instead of assertion.

Usage: python scripts/hyperball_probe.py [repl] [radii...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    radii = [int(x) for x in sys.argv[2:]] or [2, 3, 4, 5]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datacube_core_spark.operators.graph import (
        harmonic_centrality,
        hyperball_harmonic,
        page_edges,
    )
    from datacube_core_spark.sources.pages import pages

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    pg = pages(spark, sf, repl=repl)
    edges = page_edges(pg).localCheckpoint(eager=True)
    nodes = pg.select("doc_id").localCheckpoint(eager=True)
    n_nodes, n_edges = nodes.count(), edges.count()
    print(f"graph: {n_nodes} nodes, {n_edges} edges (repl={repl})")
    load1 = open("/proc/loadavg").read().split()[0]
    print(f"loadavg at start: {load1}")

    for r in radii:
        t0 = time.time()
        ex = harmonic_centrality(edges, nodes, radius=r)
        pairs = ex.agg(F.sum("reach")).collect()[0][0]
        t_ex = time.time() - t0
        t0 = time.time()
        hb = hyperball_harmonic(edges, nodes, iters=r, p=4)
        hb_rows = hb.count()
        t_hb = time.time() - t0
        print(
            f"radius {r}: exact {t_ex:7.1f}s ({pairs} reachable pairs) | "
            f"hyperball {t_hb:6.1f}s ({hb_rows} nodes x <=16 registers)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
