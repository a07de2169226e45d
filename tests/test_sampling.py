"""Token-budget corpus sampling: exact window plan vs threshold-search
scale plan (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.functions.text import token_count_col
from datacube_core_spark.operators.sampling import (
    token_budget_sample,
    token_budget_sample_threshold,
)

from .conftest import SF_TINY


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "lang", token_count_col(F.col("text")).cast("long").alias("tokens"))
    )


def _keyset(df):
    return {(r["doc_id"], r["lang"], r["tokens"], r["cum_tokens"]) for r in df.collect()}


@pytest.mark.parametrize("budget", [300, 2500, 10_000_000])
def test_threshold_plan_equals_exact_plan(spark, budget):
    """Identical keep-set AND identical running totals at small budget
    (boundary inside the first bucket), medium (boundary mid-grid), and
    a budget larger than every group (everything kept)."""
    docs = _docs(spark)
    exact = token_budget_sample(docs, budget)
    fast = token_budget_sample_threshold(docs, budget)
    assert _keyset(exact) == _keyset(fast)
    if budget == 10_000_000:
        assert exact.count() == docs.count()


def test_budget_invariants(spark):
    docs = _docs(spark)
    out = token_budget_sample(docs, 2500).toPandas()
    # per-group totals within budget and maximal (adding the next-best
    # excluded doc would cross it)
    all_rows = docs.toPandas()
    for lang, grp in out.groupby("lang"):
        assert grp.cum_tokens.max() <= 2500
        kept = set(grp.doc_id)
        rest = all_rows[(all_rows.lang == lang) & (~all_rows.doc_id.isin(kept))]
        if len(rest):
            best_excluded = rest.sort_values(["tokens", "doc_id"], ascending=[False, True]).iloc[0]
            # exact semantics: the FIRST excluded row in priority order is
            # the one that would have crossed the budget
            order = all_rows[all_rows.lang == lang].sort_values(
                ["tokens", "doc_id"], ascending=[False, True]
            )
            cum = 0
            for row in order.itertuples():
                cum += row.tokens
                if cum > 2500:
                    assert row.doc_id not in kept
                    break
                assert row.doc_id in kept


def test_threshold_plan_shape(spark):
    """Scale claims: the strictly-better-bucket prefix must be admitted by
    a broadcast join (no full-group window over the ORIGINAL rows — the
    only windows run over the kept prefix and the single boundary
    bucket), and no Python appears in the plan."""
    docs = _docs(spark)
    out = token_budget_sample_threshold(docs, 2500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan.split("== Initial Plan ==")[0]


def test_constant_priority_degenerates_safely(spark):
    """All-equal priorities put every row in one bucket: the threshold
    plan degenerates to the exact window over that bucket (documented)."""
    df = spark.createDataFrame(
        [(i, "en", 10) for i in range(20)], "doc_id LONG, lang STRING, tokens LONG"
    )
    exact = token_budget_sample(df, 55, priority=(("tokens", "desc"), ("doc_id", "asc")))
    fast = token_budget_sample_threshold(df, 55)
    assert _keyset(exact) == _keyset(fast)
    assert exact.count() == 5  # 5 * 10 <= 55 < 6 * 10


def test_threshold_plan_handles_null_tokens(spark):
    """Review-pass-2 finding: NULL token/priority rows crashed the
    threshold plan's driver loop; both plans must agree on them (nulls
    sort last, contribute nothing to sums)."""
    rows = [(i, "en", (i * 37) % 500 + 1) for i in range(400)]
    rows += [(1000 + i, "en", None) for i in range(5)]       # null tokens
    rows += [(2000 + i, "de", (i * 11) % 90 + 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, tokens LONG")
    for budget in (1_000, 30_000, 10_000_000):
        exact = token_budget_sample(df, budget)
        fast = token_budget_sample_threshold(df, budget)
        assert _keyset(exact) == _keyset(fast), f"budget={budget}"


def test_null_priority_ascending_mode(spark):
    """r4-advice finding (sampling.py:100): Spark's bare .asc() is nulls
    FIRST, so with priority_desc=False the exact window put NULL-priority
    rows at the TOP while the threshold plan routed them to the worst
    bucket — divergent keep-sets.  Both orders are now *_nulls_last; the
    two plans must agree in BOTH directions with NULLs present."""
    rows = [(i, "en", (i * 37) % 500 + 1) for i in range(400)]
    rows += [(1000 + i, "en", None) for i in range(5)]
    rows += [(2000 + i, "de", (i * 11) % 90 + 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, tokens LONG")
    for budget in (1_000, 30_000):
        exact = token_budget_sample(
            df, budget, priority=(("tokens", "asc"), ("doc_id", "asc"))
        )
        fast = token_budget_sample_threshold(df, budget, priority_desc=False)
        assert _keyset(exact) == _keyset(fast), f"budget={budget} (asc)"
        # NULL rows are worst-priority: with a finite budget they are
        # never admitted ahead of any non-NULL row
        assert not any(k[0] >= 1000 and k[0] < 2000 for k in _keyset(exact))


def test_threshold_decision_is_distributed_high_cardinality(spark):
    """VERDICT r5 item 4: the boundary decision must stay executor-side.
    Synthetic corpus with 10^5 groups — the old driver collect of the
    (group × bucket) grid would materialize ~10^5·buckets rows; the new
    plan computes per-group thresholds with a bounded window and joins
    them back.  Keep-set must equal the exact window plan, and the
    operator source must contain no driver collect at all."""
    import inspect

    from datacube_core_spark.operators import sampling as mod

    src = inspect.getsource(mod.token_budget_sample_threshold)
    assert ".collect(" not in src and "createDataFrame" not in src

    n_groups = 100_000
    df = (
        spark.range(0, n_groups * 4)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_groups).cast("string").alias("lang"),
            (F.pmod(F.xxhash64("id"), F.lit(997)) + F.lit(1)).cast("long").alias("tokens"),
        )
    )
    budget = 1500
    exact = token_budget_sample(df, budget)
    fast = token_budget_sample_threshold(df, budget)
    # compare aggregates first (cheap), then the exact keep-set
    ea = exact.agg(F.count("*"), F.sum("tokens"), F.sum("cum_tokens")).collect()[0]
    fa = fast.agg(F.count("*"), F.sum("tokens"), F.sum("cum_tokens")).collect()[0]
    assert tuple(ea) == tuple(fa)
    assert _keyset(exact) == _keyset(fast)


def test_null_token_prefix_distinct_priority(spark):
    """Review-pass (r6): when priority_col != token_col, the best-priority
    rows can carry NULL tokens — their running sum is NULL, and the exact
    plan's WHERE cum <= budget drops them.  The threshold plan's
    strictly-better-bucket tier admitted rows by the join ALONE (no cum
    predicate), keeping those NULL-cum rows: divergent keep-sets.  Both
    plans must agree with an all-NULL-token prefix present."""
    rows = [(i, "en", None, 1000 - i) for i in range(5)]  # best priority, NULL tokens
    rows += [(100 + i, "en", 50 + i, 500 - i) for i in range(60)]
    rows += [(2000 + i, "de", 30, 100 - i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, tokens LONG, score LONG")
    for budget in (200, 1500, 10_000_000):
        exact = token_budget_sample(
            df, budget, priority=(("score", "desc"), ("doc_id", "asc"))
        )
        fast = token_budget_sample_threshold(df, budget, priority_col="score")
        assert _keyset(exact) == _keyset(fast), f"budget={budget}"
        # the NULL-cum prefix rows are dropped by BOTH plans
        assert not any(k[0] < 5 for k in _keyset(fast)), f"budget={budget}"


def test_epoch_shuffle_is_deterministic_permutation(spark):
    """Epoch shuffle (r6): (shard, pos) is a bijection over the corpus,
    reproducible across partition layouts (unlike orderBy(rand())), and
    different epochs give genuinely different permutations."""
    from datacube_core_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select("doc_id")
    out = epoch_shuffle(docs, epoch=2, n_shards=16)
    rows = {(int(r["shard"]), int(r["pos"])): int(r["doc_id"]) for r in out.collect()}
    n = docs.count()
    assert len(rows) == n  # (shard, pos) unique
    # positions are dense 0..k-1 within each shard
    from collections import Counter

    per = Counter(s for s, _ in rows)
    for s, cnt in per.items():
        assert {p for sh, p in rows if sh == s} == set(range(cnt))
    # layout-independence: a different partitioning produces the same map
    rows2 = {
        (int(r["shard"]), int(r["pos"])): int(r["doc_id"])
        for r in epoch_shuffle(docs.repartition(7), epoch=2, n_shards=16).collect()
    }
    assert rows2 == rows
    # a different epoch moves most documents
    rows3 = {
        (int(r["shard"]), int(r["pos"])): int(r["doc_id"])
        for r in epoch_shuffle(docs, epoch=3, n_shards=16).collect()
    }
    same = sum(1 for k, v in rows.items() if rows3.get(k) == v)
    assert same < n * 0.05
    # shards are reasonably balanced (tabulation mix, 500 docs, 16 shards)
    assert max(per.values()) < 3 * n / 16


def test_epoch_shuffle_no_global_sort(spark):
    """Scale shape: the permutation must come from per-shard windows
    (parallel writer sorts), never a single-partition global sort."""
    from datacube_core_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select("doc_id")
    plan = epoch_shuffle(docs, epoch=1, n_shards=16)._jdf.queryExecution().executedPlan().toString()
    head = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in head
    assert "BatchEvalPython" not in head and "MapInPandas" not in head


def test_pack_sequences_invariants(spark):
    """Packing (r6): per shard the concatenated stream is gapless
    (start_off of pos p = sum of tokens before p), windows are
    consistent (first_win = start//W, last_win covers the doc's final
    token), and a dataloader reading window W gets exactly the docs
    whose spans intersect [W*Wt, (W+1)*Wt)."""
    from datacube_core_spark.functions.text import token_count_col
    from datacube_core_spark.operators.sampling import epoch_shuffle, pack_sequences

    W = 512
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("tokens")
    )
    out = pack_sequences(epoch_shuffle(docs, epoch=1, n_shards=8), window_tokens=W).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(int(r["shard"]), []).append(r)
    assert len(by_shard) > 1
    for s, rows in by_shard.items():
        rows.sort(key=lambda r: int(r["pos"]))
        off = 0
        for r in rows:
            assert int(r["start_off"]) == off           # gapless stream
            assert int(r["first_win"]) == off // W
            end = off + int(r["tokens"])
            assert int(r["last_win"]) == max(off, end - 1) // W
            off = end
        # window readback: every token of window 0 accounted for exactly once
        w0 = [r for r in rows if int(r["first_win"]) <= 0 <= int(r["last_win"])]
        covered = sum(
            min(int(r["start_off"]) + int(r["tokens"]), W) - int(r["start_off"])
            for r in w0
        )
        assert covered == min(off, W)
    # boundary-spanning docs exist at this window size (the flag works)
    assert any(int(r["last_win"]) > int(r["first_win"]) for r in out)
