"""Probe: as-of join plain window vs ts-bucketed path on ONE hot key.

The plain union+window path partitions by key — a single hot key is one
window partition = one task, no matter how many executors exist.  The
ts_bucket path bounds window partitions by bucket width.  This probe
builds a worst-case shape (every row the same key) and measures both.

Run: python scripts/asof_skew_probe.py [n_left] [n_right]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datacube_core_spark.operators.asof import asof_join

N_L = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_R = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# one hot key; ts spread over [0, 1e9); payload deterministic
left = spark.range(N_L).select(
    F.lit(0).alias("k"),
    ((F.col("id") * 2654435761) % 1_000_000_000).alias("lts"),
    F.col("id").alias("lv"),
)
right = spark.range(N_R).select(
    F.lit(0).alias("k"),
    ((F.col("id") * 1103515245 + 12345) % 1_000_000_000).alias("rts"),
    (F.col("id") % 1000).alias("pv"),
)
# contract: (k, rts) unique — the LCG above collides; dedupe once
right = right.groupBy("k", "rts").agg(F.max("pv").alias("pv"))


def run(tag, **kw):
    t0 = time.time()
    out = asof_join(left, right, ["k"], "lts", "rts", ["pv"], **kw)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("pv").alias("s"),
        F.sum("rts_matched").alias("st"),
    ).collect()[0]
    dt = time.time() - t0
    print(f"{tag:>28}: {dt:7.2f}s  n={agg.n}  sum_pv={agg.s}  sum_mts={agg.st}")
    return dt, (agg.n, agg.s, agg.st)


t_plain, sig_plain = run("plain (1 window partition)")
t_b, sig_b = run("ts_bucket=1e7 (100 buckets)", ts_bucket=1e7)
t_b2, sig_b2 = run("ts_bucket=1e6 (1000 buckets)", ts_bucket=1e6)
assert sig_plain == sig_b == sig_b2, (sig_plain, sig_b, sig_b2)
print(f"speedup: {t_plain / t_b:.2f}x (100 buckets), {t_plain / t_b2:.2f}x (1000 buckets); results identical")
