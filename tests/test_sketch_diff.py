"""HLL distinct sketch (operators/sketch.py) + snapshot diff
(operators/diff.py): cross-engine bitwise contracts and semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.operators.diff import snapshot_diff, sql_snapshot_diff
from datacube_core_spark.operators.sketch import (
    hll_count_distinct,
    sql_hll_count_distinct,
)


def test_hll_distinct_matches_duckdb_bitwise(spark):
    """Same groups/values in both engines -> identical exact register
    sums AND bitwise-equal float estimates."""
    rows = [(f"g{i % 3}", f"v{(i * i) % 41}") for i in range(500)]
    rows += [("g0", None)]  # NULLs ignored
    df = spark.createDataFrame(rows, "g STRING, v STRING")
    got = {
        r["g"]: (r["s"], r["est"])
        for r in hll_count_distinct(df, ("g",), F.col("v"), p=4).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            sql_hll_count_distinct("t", ("g",), "v")
        ).fetchall()
    }
    assert got == exp


def test_hll_distinct_tracks_exact(spark):
    """Estimate within the expected HLL band of the true distinct count
    (p=6 -> m=64, ~13% std error; deterministic inputs, fixed outcome).
    Duplicates must not move the sketch: distinct-of-values only."""
    vals = [(f"k{i % 97}",) for i in range(3000)]  # 97 distinct, heavy dupes
    df = spark.createDataFrame(vals, "v STRING").withColumn("g", F.lit("all"))
    row = hll_count_distinct(df, ("g",), F.col("v"), p=6).collect()[0]
    assert 97 * 0.6 < row["est"] < 97 * 1.4, row["est"]
    # adding MORE duplicates of existing values changes nothing
    df2 = df.union(df)
    row2 = hll_count_distinct(df2, ("g",), F.col("v"), p=6).collect()[0]
    assert (row2["s"], row2["est"]) == (row["s"], row["est"])


def test_snapshot_diff_statuses(spark):
    """All four statuses + the NULL-fingerprint re-fetch policy."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")], "k LONG, fp STRING"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, None), (5, None), (6, "f")], "k LONG, fp STRING"
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ("k",), "fp").collect()
    }
    exp = {
        1: "same",
        2: "changed",
        3: "removed",
        4: "changed",  # NULL fp on both sides -> re-fetch, never 'same'
        5: "changed",  # NULL fp on one side
        6: "added",
    }
    assert got == exp
    con = duckdb.connect()
    con.execute("CREATE TABLE o (k BIGINT, fp VARCHAR)")
    con.executemany("INSERT INTO o VALUES (?, ?)", [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")])
    con.execute("CREATE TABLE n (k BIGINT, fp VARCHAR)")
    con.executemany("INSERT INTO n VALUES (?, ?)", [(1, "a"), (2, "B"), (4, None), (5, None), (6, "f")])
    duck = dict(con.execute(sql_snapshot_diff("o", "n", ("k",))).fetchall())
    assert duck == exp


def test_snapshot_diff_is_sort_merge_not_cartesian(spark):
    old = spark.range(100).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("fp")
    )
    new = spark.range(50, 150).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("fp")
    )
    plan = (
        snapshot_diff(old, new, ("k",), "fp")
        ._jdf.queryExecution().executedPlan().toString()
    )
    head = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in head and "BroadcastNestedLoopJoin" not in head
    assert "Python" not in head


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The streamed register state (complete mode, availableNow) folded
    by hll_estimate equals the one-shot batch hll_count_distinct —
    incremental maintenance changes nothing (max is order-insensitive)."""
    from datacube_core_spark.operators.sketch import hll_estimate
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.streaming.jobs import (
        stream_pages,
        streaming_hll_registers,
    )
    from .conftest import SF_TINY

    src = str(tmp_path / "hll_src")
    p = pages(spark, SF_TINY)
    p.write.mode("overwrite").parquet(src)

    stream = stream_pages(spark, src, max_files_per_trigger=1)  # many batches
    regs = streaming_hll_registers(stream, ("lang",), "url", p=4)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in hll_estimate(
            spark.table("hll_regs_t"), ("lang",), p=4
        ).collect()
    }
    exp = {
        tuple(r)
        for r in hll_count_distinct(p, ("lang",), F.col("url"), p=4).collect()
    }
    assert got == exp and got


def test_topk_per_group_salted_equals_direct(spark):
    """Two-level truncation == direct single-window top-k (the DuckDB
    twin is deliberately the direct form) — on a skewed input with a hot
    group and heavy ties."""
    from datacube_core_spark.operators.skew import (
        sql_topk_per_group,
        topk_per_group,
    )

    rows = [("hot", (i * 7) % 50, i) for i in range(5000)]
    rows += [("cold", i % 5, i + 100000) for i in range(20)]
    rows += [("tiny", 1, 999999)]  # group smaller than k
    df = spark.createDataFrame(rows, "g STRING, score LONG, id LONG")
    got = sorted(
        (r["g"], r["rank"], r["score"], r["id"])
        for r in topk_per_group(df, ("g",), "score", 5, "id", n_salt=8).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, score BIGINT, id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = sorted(
        (r[0], r[3], r[1], r[2])
        for r in con.execute(sql_topk_per_group("t", ("g",), "score", 5, "id")).fetchall()
    )
    assert got == exp
    assert len([r for r in got if r[0] == "tiny"]) == 1  # small group kept whole


def test_cms_one_sided_and_bitwise(spark):
    """est >= true for EVERY key (collisions only add); Spark == DuckDB
    == a python replay of the same md5 windows; NULLs ignored."""
    import hashlib

    from datacube_core_spark.operators.sketch import (
        CMS_STARTS,
        cms_lookup,
        cms_table,
        sql_cms_lookup,
        sql_cms_table,
    )

    W, D = 8, 3  # tiny -> guaranteed collisions
    vals = [f"k{(i * i) % 23}" for i in range(600)]
    rows = [(v,) for v in vals] + [(None,)]
    df = spark.createDataFrame(rows, "v STRING")
    probes = df.where(F.col("v").isNotNull()).distinct()
    got = {
        r["v"]: r["est"]
        for r in cms_lookup(cms_table(df, F.col("v"), W, D), probes, "v", W, D).collect()
    }

    # python replay
    import collections
    mat = collections.Counter()
    def h(v, i):
        hx = hashlib.md5(v.encode()).hexdigest()
        s = CMS_STARTS[i]
        return int(hx[s - 1:s - 1 + 8], 16) % W
    for v in vals:
        for i in range(D):
            mat[(i, h(v, i))] += 1
    true = collections.Counter(vals)
    exp = {v: min(mat[(i, h(v, i))] for i in range(D)) for v in set(vals)}
    assert got == exp
    assert all(got[v] >= true[v] for v in true)
    assert any(got[v] > true[v] for v in true)  # W=8 must collide

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    duck = dict(con.execute(
        f"WITH cms AS ({sql_cms_table('t', 'v', W, D)}) "
        + sql_cms_lookup("cms", "(SELECT DISTINCT v FROM t WHERE v IS NOT NULL)", "v", W, D)
    ).fetchall())
    assert duck == exp


def test_topk_null_order_and_cms_null_probe(spark):
    """Review findings: NULL order values rank LAST in both engines;
    NULL probes are dropped by cms_lookup like the SQL twin."""
    from datacube_core_spark.operators.skew import (
        sql_topk_per_group,
        topk_per_group,
    )

    rows = [("g", 10, 1), ("g", None, 2), ("g", 5, 3)]
    df = spark.createDataFrame(rows, "g STRING, score LONG, id LONG")
    got = sorted(
        (r["rank"], r["id"])
        for r in topk_per_group(df, ("g",), "score", 3, "id", n_salt=4).collect()
    )
    assert got == [(1, 1), (2, 3), (3, 2)]  # NULL score ranks last
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, score BIGINT, id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = sorted(
        (r[3], r[2])
        for r in con.execute(sql_topk_per_group("t", ("g",), "score", 3, "id")).fetchall()
    )
    assert got == exp

    from datacube_core_spark.operators.sketch import cms_lookup, cms_table

    data = spark.createDataFrame([("x",), ("x",), ("y",)], "v STRING")
    probes = spark.createDataFrame([("x",), (None,)], "v STRING")
    est = cms_lookup(cms_table(data, F.col("v")), probes, "v").collect()
    assert {r["v"]: r["est"] for r in est} == {"x": 2}  # NULL probe dropped


def test_hyperball_drops_nonnode_targets_and_guards_iters(spark):
    """Review findings: output is anchored on `nodes` even when edges
    point at uncrawled targets; iters=0 raises in both dialects."""
    import pytest as _pytest

    from datacube_core_spark.operators.graph import (
        hyperball_harmonic,
        sql_hyperball,
    )

    edges = [(0, 1), (1, 99)]  # 99 is NOT a node (dangling target)
    nodes = [0, 1]
    edf = spark.createDataFrame(edges, "src LONG, dst LONG")
    ndf = spark.createDataFrame([(v,) for v in nodes], "doc_id LONG")
    out = hyperball_harmonic(edf, ndf, iters=2, p=4).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1]
    assert all(r["s0"] is not None for r in out)
    with _pytest.raises(ValueError):
        hyperball_harmonic(edf, ndf, iters=0)
    with _pytest.raises(ValueError):
        sql_hyperball("e", "n", iters=0)


def test_streaming_cms_matches_batch(spark, tmp_path):
    """Streamed CMS matrix (complete mode, multi-batch) == one-shot
    batch cms_table; estimates via the same display-time lookup."""
    from datacube_core_spark.operators.sketch import cms_lookup, cms_table
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.streaming.jobs import (
        stream_pages,
        streaming_cms_table,
    )
    from .conftest import SF_TINY

    src = str(tmp_path / "cms_src")
    p = pages(spark, SF_TINY)
    p.write.mode("overwrite").parquet(src)

    stream = stream_pages(spark, src, max_files_per_trigger=1)
    q = (
        streaming_cms_table(stream, "lang", w=16, d=2)
        .writeStream.format("memory")
        .queryName("cms_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["i"], r["b"]): r["c"] for r in spark.table("cms_t").collect()
    }
    exp = {
        (r["i"], r["b"]): r["c"]
        for r in cms_table(p, F.col("lang"), w=16, d=2).collect()
    }
    assert got == exp and got
    probes = p.select("lang").distinct()
    est_stream = {
        r["lang"]: r["est"]
        for r in cms_lookup(spark.table("cms_t"), probes, "lang", 16, 2).collect()
    }
    true = {r["lang"]: r["n"] for r in p.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(est_stream[k] >= v for k, v in true.items())


def test_bloom_no_false_negatives_and_bitwise(spark):
    """Every inserted value tests positive (one-sided guarantee); an
    undersized filter produces false positives; Spark == DuckDB on the
    word/mask table AND on every membership verdict; NULLs ignored."""
    from datacube_core_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        sql_bloom_build,
        sql_bloom_might_contain,
    )

    members = [f"m{i}" for i in range(40)]
    others = [f"x{i}" for i in range(400)]
    mdf = spark.createDataFrame([(v,) for v in members] + [(None,)], "v STRING")
    bloom = bloom_build(mdf, F.col("v"), n_bits=128, k=3)
    probes = spark.createDataFrame(
        [(v,) for v in members + others], "v STRING"
    )
    got = {
        r["v"]: r["in_bloom"]
        for r in bloom_might_contain(bloom, probes, "v", 128, 3).collect()
    }
    assert all(got[v] for v in members)          # no false negatives
    fps = sum(got[v] for v in others)
    assert 0 < fps < len(others)                 # undersized -> some FPs

    con = duckdb.connect()
    con.execute("CREATE TABLE m (v VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?)", [(v,) for v in members] + [(None,)])
    con.execute("CREATE TABLE p (v VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?)", [(v,) for v in members + others])
    words = dict(con.execute(sql_bloom_build("m", "v", 128, 3)).fetchall())
    spark_words = {r["word"]: r["mask"] for r in bloom.collect()}
    assert words == spark_words
    duck = dict(con.execute(
        f"WITH bloom AS ({sql_bloom_build('m', 'v', 128, 3)}) "
        + sql_bloom_might_contain("bloom", "p", ("v",), "v", 128, 3)
    ).fetchall())
    assert duck == got


def test_streaming_bloom_and_quantile_bins_match_batch(spark, tmp_path):
    """The last two streaming maintenance twins: Bloom word table and
    quantile bin counts streamed multi-batch == one-shot batch; the
    read-time folds produce identical verdicts/quantiles."""
    from datacube_core_spark.operators.quantile import (
        group_quantiles_hist,
        quantiles_from_bins,
    )
    from datacube_core_spark.operators.sketch import bloom_build
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.streaming.jobs import (
        stream_pages,
        streaming_bloom_words,
        streaming_quantile_bins,
    )
    from .conftest import SF_TINY

    src = str(tmp_path / "sbq_src")
    p = pages(spark, SF_TINY)
    p.write.mode("overwrite").parquet(src)

    s1 = stream_pages(spark, src, max_files_per_trigger=1)
    (
        streaming_bloom_words(s1, "url", n_bits=256, k=3)
        .writeStream.format("memory").queryName("bloom_w")
        .outputMode("complete").trigger(availableNow=True).start()
        .awaitTermination(120)
    )
    got_words = {
        r["word"]: r["mask"] for r in spark.table("bloom_w").collect()
    }
    exp_words = {
        r["word"]: r["mask"]
        for r in bloom_build(p, F.col("url"), n_bits=256, k=3).collect()
    }
    assert got_words == exp_words and got_words

    s2 = stream_pages(spark, src, max_files_per_trigger=1)
    (
        streaming_quantile_bins(s2, ("lang",), "doc_id", bin_width=16)
        .writeStream.format("memory").queryName("qbins")
        .outputMode("complete").trigger(availableNow=True).start()
        .awaitTermination(120)
    )
    got_q = {
        (r["lang"], r["q_num"]): r["val"]
        for r in quantiles_from_bins(
            spark.table("qbins"), ("lang",), bin_width=16
        ).collect()
    }
    exp_q = {
        (r["lang"], r["q_num"]): r["val"]
        for r in group_quantiles_hist(
            p.select("lang", "doc_id"), ("lang",), "doc_id", bin_width=16
        ).collect()
    }
    assert got_q == exp_q and got_q


def test_bloom_null_probe_and_mapside_plan(spark):
    """Second-review findings: NULL probes are dropped in BOTH dialects
    (the first SQL twin CRASHED DuckDB on a NULL probe via
    CAST('0x' AS BIGINT)); the probe side has NO exchange at all; probe
    columns named like internals pass through."""
    from datacube_core_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        sql_bloom_build,
        sql_bloom_might_contain,
    )

    mdf = spark.createDataFrame([("a",), ("b",)], "v STRING")
    bloom = bloom_build(mdf, F.col("v"), n_bits=128, k=3)
    probes = spark.createDataFrame(
        [("a", 7), (None, 8), ("z", 9)], "v STRING, mask LONG"  # 'mask' collides on purpose
    )
    res = bloom_might_contain(bloom, probes, "v", 128, 3)
    got = {r["v"]: (r["mask"], r["in_bloom"]) for r in res.collect()}
    assert got["a"] == (7, True) and None not in got  # NULL probe dropped
    plan = res._jdf.queryExecution().executedPlan().toString()
    head = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in head  # truly map-side

    con = duckdb.connect()
    con.execute("CREATE TABLE m (v VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?)", [("a",), ("b",)])
    con.execute("CREATE TABLE p (v VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?)", [("a",), (None,), ("z",)])
    duck = dict(con.execute(
        f"WITH bloom AS ({sql_bloom_build('m', 'v', 128, 3)}) "
        + sql_bloom_might_contain("bloom", "p", ("v",), "v", 128, 3)
    ).fetchall())
    assert duck == {v: b for v, (_, b) in got.items()}


def test_hyperball_duplicate_nodes_no_fanout(spark):
    """Second-review finding: a duplicate row in `nodes` must not fan
    out the per-node result (left_semi anchor, matching the twin's
    GROUP BY)."""
    from datacube_core_spark.operators.graph import hyperball_harmonic

    edges = [(0, 1), (1, 0)]
    edf = spark.createDataFrame(edges, "src LONG, dst LONG")
    ndf = spark.createDataFrame([(0,), (1,), (1,)], "doc_id LONG")  # dup
    out = hyperball_harmonic(edf, ndf, iters=2, p=4).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1]


def test_sql_random_walks_guard(spark):
    import pytest as _pytest

    from datacube_core_spark.operators.graph import sql_random_walks

    with _pytest.raises(ValueError):
        sql_random_walks("e", "n", walks_per_node=0)
    with _pytest.raises(ValueError):
        sql_random_walks("e", "n", length=0)
