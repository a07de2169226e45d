"""Structured Streaming jobs over the pages stream.

The reference has no streaming engine (SURVEY §2.10); its closest analogs
are incremental indexing and ``archive_less_mature`` dedup-on-arrival
(reference ``datacube/index/abstract.py:902-988``).  Spark-first
restatement:

* :func:`streaming_cell_counts` — incremental per-cell observation
  counts: watermark + tumbling window + groupBy(tile) — the streaming
  version of ``count_datasets_through_time``.
* :func:`streaming_dedup` — dedup-on-arrival:
  ``dropDuplicatesWithinWatermark`` on url (the reference archives the
  less-mature duplicate arriving within a time delta).
* :func:`stream_pages` — file-source stream with the pages schema
  (stands in for a readStream of the Iceberg table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from ..operators.tiling import point_tile_cols

PAGES_SCHEMA = (
    "doc_id LONG, url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, "
    "lang STRING, lon DOUBLE, lat DOUBLE"
)


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_cell_counts(
    stream: DataFrame,
    grid: GridSpec,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-tile page counts with late-data handling."""
    tx, ty = point_tile_cols(grid, F.col("lon"), F.col("lat"))
    return (
        stream.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "tile_x", "tile_y", "n")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Dedup-on-arrival: keep the first page per url within the watermark
    horizon (archive_less_mature semantics for the streaming path)."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


def streaming_content_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """CONTENT dedup-on-arrival: keep the first page per content
    fingerprint (md5 of whitespace-normalized lowercase text) within the
    watermark horizon — catches mirrors/re-hosts that url-dedup misses.
    The fingerprint is computed in the stream plan (pure Catalyst), so
    state size is one 16-char key per distinct content, not the text."""
    from ..functions.text import fingerprint_col

    return (
        stream.withColumn("_fp", fingerprint_col(F.col("text")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def streaming_hll_registers(
    stream: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = 4,
) -> DataFrame:
    """Continuously maintained HLL distinct-count sketch (e.g. live
    distinct-URL monitoring per host): the register definition is the
    BATCH one (``operators/sketch.hll_registers``) applied to the stream
    — groupBy(group, bucket).max(rank) is a supported streaming
    aggregate, state is ≤ m rows per group FOREVER (no watermark needed:
    registers only grow, there is no late-data eviction problem), and
    the estimate is a display-time fold over the tiny register sink
    (``operators/sketch.hll_estimate``).  The two-stage split exists
    because chained stateful aggregations are not allowed in one
    streaming query — and estimate-on-read is the production shape
    anyway."""
    from ..operators.sketch import hll_registers

    return hll_registers(stream, group_cols, F.col(value_col), p=p)


def streaming_cms_table(
    stream: DataFrame,
    value_col: str,
    w: int = 256,
    d: int = 4,
) -> DataFrame:
    """Continuously maintained count-min sketch (live heavy-hitter /
    term-frequency monitoring): the batch definition
    (``operators/sketch.cms_table``) applied to the stream — the build
    is one groupBy(i, b).count, a supported streaming aggregate whose
    state is ≤ d·w rows FOREVER (same no-watermark argument as
    :func:`streaming_hll_registers`: counts only grow).  Point estimates
    are a display-time ``cms_lookup`` against the matrix sink."""
    from ..operators.sketch import cms_table

    return cms_table(stream, F.col(value_col), w=w, d=d)


def streaming_bloom_words(
    stream: DataFrame,
    value_col: str,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Continuously maintained Bloom filter (live seen-URL / blocklist
    state): bit_or is an associative, commutative streaming aggregate,
    state is ≤ n_bits/32 (word, mask) rows forever — membership tests
    are a display-time ``bloom_might_contain`` against the word sink."""
    from ..operators.sketch import bloom_build

    return bloom_build(stream, F.col(value_col), n_bits=n_bits, k=k)


def streaming_quantile_bins(
    stream: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    bin_width: int = 1,
    bin_origin: int = 0,
) -> DataFrame:
    """Continuously maintained quantile histogram: the bin-count half of
    ``operators/quantile.group_quantiles_hist`` (groupBy(group, bin)
    count — a supported streaming aggregate, ≤ n_bins rows per group),
    with the rank-selection fold applied at read time over the tiny bin
    sink.  Completes the streaming sketch matrix: HLL registers, CMS
    matrix, Bloom words, quantile bins — each one the batch definition
    applied to a stream, each estimate-on-read."""
    from ..operators.quantile import quantile_bin_counts

    return quantile_bin_counts(
        stream, group_cols, value_col, bin_width, bin_origin
    )


def streaming_cell_state(
    stream: DataFrame,
    grid: GridSpec,
    watermark: str = "1 day",
    timeout_duration: str = "30 days",
    bootstrap: DataFrame = None,
) -> DataFrame:
    """Custom stateful operator: per-cell running observation state
    (count, min/max ts) maintained with ``applyInPandasWithState`` —
    the engine's incremental analog of the checkpoint/metrics tables.

    Emits one updated row per cell per micro-batch:
    (tile_x, tile_y, n, first_ts, last_ts).

    ``bootstrap`` closes the state-restore gap across restarts WITHOUT a
    streaming checkpoint: a batch DataFrame (tile_x, tile_y, n, first_ts,
    last_ts) — e.g. aggregated from the batch checkpoint/metrics tables —
    is broadcast and used to seed any cell whose streaming state does not
    exist yet (PySpark's applyInPandasWithState has no initialState
    parameter, so seeding happens lazily on first touch; already-running
    state always wins).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    seed_map = {}
    if bootstrap is not None:
        for r in bootstrap.select("tile_x", "tile_y", "n", "first_ts", "last_ts").collect():
            seed_map[(int(r["tile_x"]), int(r["tile_y"]))] = (
                int(r["n"]),
                pd.Timestamp(r["first_ts"]).value // 1000,
                pd.Timestamp(r["last_ts"]).value // 1000,
            )
    bc_seed = stream.sparkSession.sparkContext.broadcast(seed_map)

    tx, ty = point_tile_cols(grid, F.col("lon"), F.col("lat"))
    keyed = (
        stream.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withWatermark("warc_ts", watermark)
        .select("tile_x", "tile_y", "warc_ts")
    )

    out_schema = "tile_x INT, tile_y INT, n LONG, first_ts TIMESTAMP, last_ts TIMESTAMP"
    state_schema = "n LONG, first_us LONG, last_us LONG"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, first_us, last_us = state.get
        else:
            n, first_us, last_us = bc_seed.value.get((int(key[0]), int(key[1])), (0, None, None))
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["warc_ts"])
            if len(ts) == 0:
                continue
            n += len(ts)
            lo = ts.min().value // 1000
            hi = ts.max().value // 1000
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        yield pd.DataFrame(
            {
                "tile_x": [key[0]],
                "tile_y": [key[1]],
                "n": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return keyed.groupBy("tile_x", "tile_y").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_state_from_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user resume state for :func:`streaming_sessionize` derived from
    a BATCH event history (the restart-bootstrap source): the same
    lag+running-sum window plan as the batch ``sessionize`` entry, reduced
    to each user's LAST event — ``(user_id, session_start, last_ts)``.
    Feed the result as ``bootstrap`` so a restarted stream continues the
    in-flight session under the same session id instead of restarting it."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # MICROseconds, matching streaming_sessionize's state arithmetic
    # exactly — a millisecond-truncated gap could disagree with the
    # uninterrupted stream on sub-ms timestamps right at the threshold
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    assigned = (
        events.select("user_id", "event_id", "ts")
        .withColumn(
            "session_n",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .withColumn(
            "session_start", F.min("ts").over(Window.partitionBy("user_id", "session_n"))
        )
    )
    wd = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        assigned.withColumn("_rn", F.row_number().over(wd))
        .where(F.col("_rn") == 1)
        .select("user_id", "session_start", F.col("ts").alias("last_ts"))
    )


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 day",
    bootstrap: DataFrame = None,
) -> DataFrame:
    """Stateful gap-based sessionization — the streaming twin of the
    batch ``sessionize`` window plan (entry ``q_sessionize``): per user,
    an event starts a NEW session when its gap from the user's previous
    event exceeds ``gap_minutes``.  Emits one row per event
    ``(user_id, event_id, ts, session_start)``.

    The session id is the session's START TIMESTAMP, not a per-user
    counter: a counter would have to live forever (evicting it renumbers
    later sessions), while the start-time id lets idle-user state expire
    LOSSLESSLY — once a user has been idle longer than the gap, any
    future event starts a fresh session whose id is its own timestamp,
    identical with or without the old state.  State per user =
    (sess_start_us, last_us), expired via EventTimeTimeout at
    last event + gap, so state size tracks ACTIVE users only (review
    pass 3: NoTimeout grew state without bound and the docstring
    mis-credited the watermark for bounding it — the watermark's actual
    job here is dropping late events).

    Batch-equivalence contract (tested): when events arrive in event-time
    order (per-user batch-monotone), the streaming assignment is
    row-identical to the batch window plan.  True late data (older than
    the watermark) needs the batch backfill path.

    ``bootstrap`` closes the restart gap WITHOUT a streaming checkpoint
    (same pattern as ``streaming_cell_state``): a batch DataFrame
    ``(user_id, session_start, last_ts)`` — from
    :func:`sessionize_state_from_batch` over the already-processed
    history — is broadcast and seeds any user whose streaming state does
    not exist yet, so an in-flight session continues under its original
    id across the restart.  Live state always wins; users idle past the
    gap are naturally unaffected (their next event starts a fresh session
    with or without a seed), which is exactly why the session id is the
    start TIMESTAMP."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    seed_map = {}
    if bootstrap is not None:
        for r in bootstrap.select("user_id", "session_start", "last_ts").collect():
            seed_map[int(r["user_id"])] = (
                pd.Timestamp(r["session_start"]).value // 1000,
                pd.Timestamp(r["last_ts"]).value // 1000,
            )
    bc_seed = events.sparkSession.sparkContext.broadcast(seed_map)

    gap_us = gap_minutes * 60 * 1_000_000
    keyed = (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
    )

    out_schema = "user_id LONG, event_id LONG, ts TIMESTAMP, session_start TIMESTAMP"
    state_schema = "sess_start_us LONG, last_us LONG"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle past the gap: any future event starts a new session
            # regardless — dropping the state cannot change assignments
            state.remove()
            return
        if state.exists:
            sess_start_us, last_us = state.get
        else:
            sess_start_us, last_us = bc_seed.value.get(int(key[0]), (None, None))
        # ONE sort over the whole micro-batch group: a group larger than
        # the Arrow batch size arrives as multiple chunks whose relative
        # order is not guaranteed (review pass 3) — sorting per chunk
        # while carrying last_us across chunks could mis-sessionize
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
            starts = []
            for t in ts_us:
                t = int(t)
                if last_us is None or t - last_us > gap_us:
                    sess_start_us = t
                starts.append(sess_start_us)
                last_us = t
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "session_start": pd.to_datetime(pd.Series(starts), unit="us"),
                }
            )
        if last_us is not None:
            state.update((sess_start_us, last_us))
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # ms

    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
