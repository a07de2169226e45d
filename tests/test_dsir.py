"""DSIR importance weights: hand arithmetic, parity, separation, plan."""

import duckdb
from pyspark.sql import functions as F

from datacube_core_spark.operators.dsir import dsir_weights, sql_dsir

ROWS = [
    (1, "alpha beta alpha beta", "en"),       # target
    (2, "alpha beta gamma delta", "en"),      # target
    (3, "gamma delta gamma delta", "fr"),     # raw-only
    (4, "alpha beta alpha beta", "fr"),       # raw-only but target-like
    (5, "one", "fr"),                         # single token → unscored
]


def _spark(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    return dsir_weights(df, F.col("lang") == "en", n_buckets=64)


def test_hand_arithmetic(spark):
    out = {r.doc_id: r for r in _spark(spark).collect()}
    assert 5 not in out
    assert out[1].n_feats == 3 and out[3].n_feats == 3
    # docs 1 and 4 share the same text → identical weights
    assert out[1].weight == out[4].weight
    # target-like text must outweigh the raw-only text: doc 3's bigrams
    # (gamma,delta)(delta,gamma) barely occur in the target
    assert out[1].weight > out[3].weight
    # hand value for doc 3's (delta,gamma) feature is reproducible from
    # the definition; spot-check the whole-doc mean instead via DuckDB
    # parity below (the arithmetic is the contract)


def test_duckdb_parity_bitwise(spark):
    got = sorted((r.doc_id, r.n_feats, r.weight) for r in _spark(spark).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?,?)", ROWS)
    want = sorted(
        tuple(r) for r in con.execute(
            "WITH " + sql_dsir("docs", "lang = 'en'", n_buckets=64)
        ).fetchall()
    )
    assert got == want  # raw-double bitwise equality


def test_weights_separate_distributions(spark):
    # synthetic: target vocabulary disjoint from noise vocabulary →
    # every pure-target-style doc outweighs every pure-noise doc
    rows = []
    for i in range(20):
        rows.append((i, " ".join(f"t{j % 7}" for j in range(i % 5 + 5)), "en"))
    for i in range(20, 40):
        rows.append((i, " ".join(f"n{(i * 3 + j) % 13}" for j in range(8)), "xx"))
    # raw docs to score: 5 target-style, 5 noise-style (all lang 'raw')
    for i in range(40, 45):
        rows.append((i, " ".join(f"t{j % 7}" for j in range(8)), "raw"))
    for i in range(45, 50):
        rows.append((i, " ".join(f"n{(i + j) % 13}" for j in range(8)), "raw"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r.weight
           for r in dsir_weights(df, F.col("lang") == "en").collect()}
    t_min = min(out[i] for i in range(40, 45))
    n_max = max(out[i] for i in range(45, 50))
    assert t_min > n_max


def test_plan_shape(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    plan = (
        dsir_weights(df, F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    # bounded feature space: no window over the full corpus
    assert "Window" not in plan
