"""Tests: virtual-product combinators, formula compiler, streaming jobs."""

import datetime

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.functions.expr import (
    compile_formula,
    compile_nodata_mask,
    formula_with_nodata,
    parse_names,
)
from datacube_core_spark.geom import GRID_PAGES, GridSpec
from datacube_core_spark.plans.virtual import (
    Aggregate,
    Collate,
    Juxtapose,
    Product,
    Reproject,
    Transform,
)
from datacube_core_spark.sources.pages import pages
from datacube_core_spark.streaming.jobs import (
    stream_pages,
    streaming_cell_counts,
    streaming_dedup,
)

from .conftest import SF_TINY


def test_formula_compiler(spark):
    df = spark.createDataFrame([(10.0, 2.0, 3)], "a DOUBLE, b DOUBLE, c LONG")
    env = {c: F.col(c) for c in df.columns}
    row = df.select(
        compile_formula("(a + b) / (a - b)", env).alias("ndvi_like"),
        compile_formula("-a ** 2", env).alias("p"),
        compile_formula("c << 2", env).alias("shift"),
        compile_formula("(c & 2) == 2", env).alias("flag"),
        compile_formula("a // 3", env).alias("fd"),
    ).collect()[0]
    assert row["ndvi_like"] == pytest.approx(12.0 / 8.0)
    assert row["p"] == -100.0  # python precedence: -(a**2)
    assert row["shift"] == 12
    assert row["flag"] is True
    assert row["fd"] == 3

    assert parse_names("(a + b) / (a - c)") == {"a", "b", "c"}
    with pytest.raises(ValueError):
        compile_formula("__import__('os')", env)
    with pytest.raises(KeyError):
        compile_formula("nope + 1", env)


def test_formula_nodata_propagation(spark):
    df = spark.createDataFrame([(1.0, 5.0), (-999.0, 5.0), (1.0, -999.0)], "a DOUBLE, b DOUBLE")
    env = {c: F.col(c) for c in df.columns}
    nodata = {"a": -999.0, "b": -999.0}
    out = df.select(formula_with_nodata("a + b", env, nodata, -1.0).alias("v")).collect()
    assert [r["v"] for r in out] == [6.0, -1.0, -1.0]


def _leaf(repl=1):
    return Product(lambda spark, sf_dir: pages(spark, sf_dir).select("doc_id", "lon", "lat", "warc_ts", "lang"))


def test_transform_and_reproject(spark):
    vp = Reproject(Transform(_leaf(), {"lon2": "lon * 2"}), GRID_PAGES)
    df = vp.build(spark, SF_TINY)
    row = df.where(F.col("doc_id") == 1).collect()[0]
    assert row["lon2"] == pytest.approx(row["lon"] * 2)
    assert row["tile_x"] == GRID_PAGES.point_tile(row["lon"], row["lat"])[0]


def test_collate_provenance_and_schema_check(spark):
    a = Product(lambda s, d: pages(s, d).where(F.col("doc_id") % 2 == 0).select("doc_id", "warc_ts"))
    b = Product(lambda s, d: pages(s, d).where(F.col("doc_id") % 2 == 1).select("doc_id", "warc_ts"))
    out = Collate([a, b], index_measurement_name="src").build(spark, SF_TINY)
    n_total = pages(spark, SF_TINY).count()
    assert out.count() == n_total
    assert set(r["src"] for r in out.select("src").distinct().collect()) == {0, 1}

    bad = Product(lambda s, d: pages(s, d).select("doc_id", "warc_ts", "lang"))
    with pytest.raises(ValueError, match="identical measurement"):
        Collate([a, bad]).build(spark, SF_TINY)


def test_collate_default_plan_has_no_global_sort(spark):
    """Scale guard: collate of two products must be a pure union — no
    Sort / range-partition Exchange unless sort=True is requested."""
    a = Product(lambda s, d: pages(s, d).where(F.col("doc_id") % 2 == 0).select("doc_id", "warc_ts"))
    b = Product(lambda s, d: pages(s, d).where(F.col("doc_id") % 2 == 1).select("doc_id", "warc_ts"))
    out = Collate([a, b], time_col="warc_ts").build(spark, SF_TINY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan and "rangepartitioning" not in plan.lower()

    sorted_out = Collate([a, b], time_col="warc_ts", sort=True).build(spark, SF_TINY)
    plan2 = sorted_out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan2.lower()
    ts = [r["warc_ts"] for r in sorted_out.collect()]
    assert ts == sorted(ts)


def test_juxtapose_collision_error(spark):
    a = Product(lambda s, d: pages(s, d).select("doc_id", F.col("lon").alias("m1")))
    b = Product(lambda s, d: pages(s, d).select("doc_id", F.col("lat").alias("m2")))
    out = Juxtapose([a, b], on=["doc_id"]).build(spark, SF_TINY)
    assert set(out.columns) == {"doc_id", "m1", "m2"}
    assert out.count() == pages(spark, SF_TINY).count()

    dup = Product(lambda s, d: pages(s, d).select("doc_id", F.col("lat").alias("m1")))
    with pytest.raises(ValueError, match="collision"):
        Juxtapose([a, dup], on=["doc_id"]).build(spark, SF_TINY)


def test_aggregate_monthly(spark):
    vp = Aggregate(
        Product(lambda s, d: pages(s, d).select(F.col("warc_ts").alias("time"), "lon")),
        bucket=lambda t: F.to_date(F.date_trunc("month", t)),
        aggs={"lon": "mean"},
    )
    out = vp.build(spark, SF_TINY)
    assert "lon_mean" in out.columns
    assert out.count() <= 12


def test_streaming_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    p = pages(spark, SF_TINY)
    p.write.mode("overwrite").parquet(src)

    stream = stream_pages(spark, src)
    assert stream.isStreaming
    counts = streaming_cell_counts(stream, GRID_PAGES, window="1 day", watermark="1 day")
    q = (
        counts.writeStream.format("memory")
        .queryName("cell_counts_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # append mode only emits windows the watermark has passed; with
    # availableNow the final windows stay open, so compare the emitted
    # subset against the batch computation
    got = {
        (r["bucket"], r["tile_x"], r["tile_y"]): r["n"]
        for r in spark.sql("SELECT * FROM cell_counts_t").collect()
    }
    from datacube_core_spark.operators.tiling import with_tile

    batch = (
        with_tile(p, GRID_PAGES)
        .groupBy(F.window("warc_ts", "1 day").alias("w"), "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "tile_x", "tile_y", "n")
    )
    exp = {(r["bucket"], r["tile_x"], r["tile_y"]): r["n"] for r in batch.collect()}
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert exp[k] == v


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    p = pages(spark, SF_TINY)
    dup = p.unionByName(p.limit(50))  # 50 duplicate urls
    dup.write.mode("overwrite").parquet(src)

    out = streaming_dedup(stream_pages(spark, src), watermark="10 days")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT COUNT(DISTINCT url) c, COUNT(*) n FROM dedup_t").collect()[0]
    assert n["c"] == n["n"]  # no duplicate urls survive
    assert n["n"] == p.select("url").distinct().count()


def test_streaming_cell_state_matches_batch(spark, tmp_path):
    from datacube_core_spark.streaming.jobs import streaming_cell_state

    src = str(tmp_path / "state_src")
    p = pages(spark, SF_TINY)
    p.write.mode("overwrite").parquet(src)

    out = streaming_cell_state(stream_pages(spark, src), GRID_PAGES)
    q = (
        out.writeStream.format("memory")
        .queryName("cell_state_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last update per cell must equal the batch aggregate
    got_df = spark.sql(
        "SELECT tile_x, tile_y, last(n) AS n FROM cell_state_t GROUP BY tile_x, tile_y"
    )
    got = {(r["tile_x"], r["tile_y"]): r["n"] for r in got_df.collect()}

    from datacube_core_spark.operators.tiling import with_tile

    exp = {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in with_tile(p, GRID_PAGES).groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    }
    # every cell's final running count equals the batch count
    assert got == exp


def test_streaming_cell_state_bootstrap_restore(spark, tmp_path):
    """Restart restore: half the corpus is processed 'before the restart'
    (batch aggregate = the checkpoint-table analog), the other half
    streams with bootstrap seeding — final state equals the full batch."""
    from datacube_core_spark.operators.tiling import with_tile
    from datacube_core_spark.streaming.jobs import streaming_cell_state

    p = pages(spark, SF_TINY)
    first = p.where(F.col("doc_id") % 2 == 0)
    second = p.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "state_src2")
    second.write.mode("overwrite").parquet(src)

    # pre-restart state from the batch tables
    seed = (
        with_tile(first, GRID_PAGES)
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
    )
    out = streaming_cell_state(stream_pages(spark, src), GRID_PAGES, bootstrap=seed)
    q = (
        out.writeStream.format("memory")
        .queryName("cell_state_boot")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in spark.sql(
            "SELECT tile_x, tile_y, last(n) AS n FROM cell_state_boot GROUP BY tile_x, tile_y"
        ).collect()
    }
    exp_full = {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in with_tile(p, GRID_PAGES).groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    }
    # cells touched by the stream carry seed + streamed counts == full batch
    for cell, n in got.items():
        assert n == exp_full[cell], cell
    assert got, "stream produced no state rows"


def test_reproject_rasters_combinator(spark):
    """Pixel-level reproject node: rasterize leaf -> warp combinator
    equals calling the distributed warp operator directly."""
    from datacube_core_spark.geom import GRID_MERC
    from datacube_core_spark.operators.raster import rasterize_rect_regions
    from datacube_core_spark.operators.warp import merc_region_tiles, warp_rasters_to_grid
    from datacube_core_spark.plans.virtual import ReprojectRasters
    from datacube_core_spark.sources.regions import regions

    regs_fn = lambda s, d: regions(s).where(F.col("region_id") < 30)
    leaf = Product(lambda s, d: rasterize_rect_regions(regs_fn(s, d), GRID_PAGES, res=1.0))
    vp = ReprojectRasters(leaf, GRID_PAGES, 1.0, GRID_MERC, 256_000.0, regions_df_fn=regs_fn)
    got = {
        (r["dst_tx"], r["dst_ty"], r["region_id"]): tuple(r["raster"])
        for r in vp.build(spark, SF_TINY).collect()
    }
    direct = warp_rasters_to_grid(
        rasterize_rect_regions(regs_fn(spark, SF_TINY), GRID_PAGES, res=1.0),
        GRID_PAGES, 1.0, GRID_MERC, 256_000.0,
        merc_region_tiles(regs_fn(spark, SF_TINY), GRID_MERC), "nearest",
    )
    exp = {
        (r["dst_tx"], r["dst_ty"], r["region_id"]): tuple(r["raster"])
        for r in direct.collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_content_dedup_matches_batch_keep_set(spark, tmp_path):
    """Streaming↔batch contract on a PLANTED late-arrival timeline
    (VERDICT r3 #8): streaming_content_dedup with watermark w must keep
    exactly the batch archive_less_mature keep-set with leniency w —
    including a duplicate that CROSSES the watermark boundary (state
    evicted → new keeper in both engines) and one inside it (dropped by
    both).  Events are fed one file per micro-batch in event-time order
    so first-arrival == earliest (deterministic survivor)."""
    import time as _time

    from datacube_core_spark.functions.text import fingerprint_col
    from datacube_core_spark.operators.dupes import archive_less_mature
    from datacube_core_spark.streaming.jobs import stream_pages, streaming_content_dedup

    t0 = "2024-01-01 00:00:00"

    # (doc_id, url, hours-after-t0, text): texts A/B repeat (same
    # fingerprint), pushers P/Q are unique and advance the watermark
    timeline = [
        (1, "a1", 0, "alpha content"),
        (2, "a2", 1, "Alpha   CONTENT"),     # in-window dup of A (normalized fp)
        (3, "b1", 2, "bravo content"),
        (4, "p1", 30, "pusher one"),          # wm -> t0+6h after this batch
        (5, "b2", 8, "bravo  content"),       # dup of B, 6h gap: dropped by both
        (6, "q1", 60, "pusher two"),          # wm -> t0+36h after this batch
        (8, "r1", 59, "pusher three"),        # state cleanup lags one batch: A
                                              # (expiry 25h) + B (expiry 26h) are
                                              # evicted at the END of this batch
        (7, "a3", 48, "alpha content"),       # 48h after a1 > 24h leniency AND
                                              # state evicted: NEW keeper in both
    ]
    src = tmp_path / "contract_src"
    src.mkdir()
    schema = "doc_id LONG, url STRING, off_h INT, text STRING"
    for row in timeline:
        one = (
            spark.createDataFrame([row], schema)
            .select(
                "doc_id", "url",
                (F.lit(t0).cast("timestamp") + F.make_interval(hours=F.col("off_h"))).alias("warc_ts"),
                F.lit(None).cast("binary").alias("html"),
                "text",
                F.lit("en").alias("lang"),
                F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat"),
            )
            .coalesce(1)
        )
        one.write.mode("append").parquet(str(src))
        _time.sleep(0.15)  # distinct mtimes → arrival order == event-time order

    out = streaming_content_dedup(stream_pages(spark, str(src), max_files_per_trigger=1),
                                  watermark="24 hours")
    q = (
        out.writeStream.format("memory").queryName("cdedup_contract")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    stream_keep = {r["url"] for r in spark.sql("SELECT url FROM cdedup_contract").collect()}

    batch = spark.read.parquet(str(src)).withColumn("_fp", fingerprint_col(F.col("text")))
    flagged = archive_less_mature(
        batch, ["_fp"], ts_col="warc_ts", leniency_ms=24 * 3600 * 1000, id_col="doc_id"
    )
    batch_keep = {r["url"] for r in flagged.where(~F.col("archived")).collect()}

    assert batch_keep == {"a1", "b1", "p1", "q1", "r1", "a3"}, batch_keep
    assert stream_keep == batch_keep


def test_streaming_content_dedup(spark, tmp_path):
    """Content-fingerprint dedup catches re-hosted pages (same text,
    different url) that url-dedup keeps; result matches the batch
    fingerprint-distinct count."""
    from datacube_core_spark.functions.text import fingerprint_col
    from datacube_core_spark.streaming.jobs import streaming_content_dedup

    src = str(tmp_path / "cdedup_src")
    p = pages(spark, SF_TINY)
    rehosted = p.limit(40).withColumn(
        "url", F.concat(F.lit("https://mirror.example/"), F.col("url"))
    )
    dup = p.unionByName(rehosted)
    dup.write.mode("overwrite").parquet(src)

    out = streaming_content_dedup(stream_pages(spark, src), watermark="10 days")
    q = (
        out.writeStream.format("memory")
        .queryName("cdedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) n FROM cdedup_t").collect()[0]["n"]
    exp = p.select(fingerprint_col(F.col("text")).alias("fp")).distinct().count()
    assert got == exp, "one survivor per distinct content"
    # schema untouched (helper column dropped)
    assert spark.table("cdedup_t").columns == p.columns


def test_streaming_sessionize_matches_batch_window(spark, tmp_path):
    """Streaming twin of the batch sessionize window plan: fed in
    event-time order (two files -> two micro-batches, sessions crossing
    the batch boundary), the per-event session assignment must be
    row-identical to the batch lag+running-sum windows."""
    import datetime as _dt

    from datacube_core_spark.streaming.jobs import streaming_sessionize

    t0 = _dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes):
        return (eid, uid, t0 + _dt.timedelta(minutes=minutes))

    # user 1: session A (0, 10min), session B (60, 65) split across batches
    # user 2: one long session crossing the batch boundary (20, 40)
    batch1 = [ev(1, 1, 0), ev(2, 1, 10), ev(10, 2, 20)]
    batch2 = [ev(3, 1, 60), ev(4, 1, 65), ev(11, 2, 40), ev(12, 2, 200)]
    src = tmp_path / "sess_src"
    src.mkdir()
    import time as _time

    schema = "event_id LONG, user_id LONG, ts TIMESTAMP"
    for batch in (batch1, batch2):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(0.2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sess_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["session_start"]
        for r in spark.sql("SELECT * FROM sess_t").collect()
    }

    # batch oracle: session id = MIN ts of the session (the eviction-safe
    # id the streaming op emits), derived from the lag+running-sum windows
    from pyspark.sql import Window

    e = spark.read.parquet(str(src))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ms = lambda c: F.unix_millis(c.cast("timestamp"))  # noqa: E731
    gap = ms(F.col("ts")) - ms(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0)
    batch = e.withColumn(
        "session_n",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).withColumn(
        "session_start",
        F.min("ts").over(Window.partitionBy("user_id", "session_n")),
    )
    exp = {(r["user_id"], r["event_id"]): r["session_start"] for r in batch.collect()}
    assert got == exp
    # the boundary-crossing session did NOT restart: user 2's events 10+11
    # share a session id, its later event 12 starts a new one
    assert got[(2, 10)] == got[(2, 11)]
    assert got[(2, 12)] > got[(2, 11)]


def test_streaming_sessionize_bootstrap_restore(spark, tmp_path):
    """Restart restore (ROADMAP r6 item): history is sessionized in batch,
    its per-user tail seeds the restarted stream — events after the
    restart continue the in-flight session under the ORIGINAL session id,
    row-identical to an uninterrupted run over the full timeline."""
    import datetime as _dt

    from datacube_core_spark.streaming.jobs import (
        sessionize_state_from_batch,
        streaming_sessionize,
    )

    t0 = _dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes):
        return (eid, uid, t0 + _dt.timedelta(minutes=minutes))

    schema = "event_id LONG, user_id LONG, ts TIMESTAMP"
    # user 1: session at (0, 10) that CONTINUES at 25 after the restart
    # (gap 15 < 30), then a new session at 90
    # user 2: idle across the restart (5 → 120): new session either way
    history = [ev(1, 1, 0), ev(2, 1, 10), ev(10, 2, 5)]
    after = [ev(3, 1, 25), ev(4, 1, 90), ev(11, 2, 120)]

    hist_df = spark.createDataFrame(history, schema)
    seed = sessionize_state_from_batch(hist_df, gap_minutes=30)

    src = tmp_path / "sess_boot_src"
    src.mkdir()
    spark.createDataFrame(after, schema).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_sessionize(stream, gap_minutes=30, bootstrap=seed)
    q = (
        out.writeStream.format("memory").queryName("sess_boot")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["session_start"]
        for r in spark.sql("SELECT * FROM sess_boot").collect()
    }
    # event 3 continues the pre-restart session: id = its START (t0+0)
    assert got[(1, 3)] == t0
    # event 4 is a fresh session (gap 65 > 30)
    assert got[(1, 4)] == t0 + _dt.timedelta(minutes=90)
    # idle user: fresh session regardless of the seed
    assert got[(2, 11)] == t0 + _dt.timedelta(minutes=120)
