"""SparkSession factory with the engine's scale-oriented defaults.

AQE on (runtime re-plan + skew-join splitting), Arrow on (all row-level
compute goes through pandas/Arrow UDFs per BASELINE.json input_hint),
shuffle partitions sized for the local[32] sandbox but overridable for a
real cluster via normal spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datacube-core-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalesce + skew-join split (hot-cell mitigation)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transport for pandas UDFs / applyInPandas / mapInPandas
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # generous broadcast threshold: region/tile dimension tables are small
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash join when its size conditions
        # are met (guide §3.1/§9): the engine's joins build against
        # aggregated/bounded sides, where SHJ skips the sort; SMJ remains
        # available and AQE skew-splitting applies to both.  Overridable
        # for clusters where sort-merge's graceful spill is preferred.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # prompt block cleanup: the query paths materialize transient
        # lazy-localCheckpoint intermediates; their JVM-side blocks are
        # only dropped when a GC collects the RDD handle, and the default
        # periodic-GC interval (30min) lets dead blocks from earlier
        # queries pile onto a long-lived session (multi-query benches,
        # notebooks), evicting live working set.  A 1-minute sweep keeps
        # storage bounded at negligible GC cost; scale-neutral.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"),
        )
        # whole-stage-codegen class cache: the default 100 entries is
        # smaller than one pass of a many-query workload (the entry
        # suite alone compiles several hundred distinct stages), so
        # steady-state re-runs recompile evicted classes every pass.
        # ~50KB/class -> ~100MB at 2000 entries, fine for the driver.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "2000"),
        )
        # NOTE: -XX:+ExplicitGCInvokesConcurrent was tried for the
        # sweep's System.gc() and measured WORSE (positional prefix
        # bench 25.2s -> 28.8s): the concurrent cycle reclaims dead
        # block references less promptly than the bounded ~100ms full
        # GC, and prompt reclamation is the sweep's whole point.
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
