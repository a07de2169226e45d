"""Bigram LM quality buckets: hand vectors, DuckDB parity, plan shape."""

import duckdb
from pyspark.sql import functions as F

from datacube_core_spark.operators.lm import bigram_lm_scores, sql_bigram_lm

ROWS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog sat on the log", "en"),
    (3, "the cat and the dog", "en"),
    (4, "one", "en"),                      # single token → unscored
    (5, "", "en"),                         # empty → unscored
    (6, "el gato y el perro", "es"),
    (7, "el perro y el gato", "es"),
    (8, "  spaced   out   text  ", "en"),
]


def _spark_rows(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    return bigram_lm_scores(df)


def test_hand_arithmetic(spark):
    out = {r.doc_id: r for r in _spark_rows(spark).collect()}
    # doc 6 "el gato y el perro": en-vocab disjoint; es vocab V=4
    # (el, gato, y, perro).  Bigrams of doc 6: (el,gato)(gato,y)(y,el)
    # (el,perro).  Counts over BOTH es docs (7 shares its bigrams
    # reversed): C(el)=4, C(gato)=1, C(y)=2, and C2(el,gato)=2,
    # C2(gato,y)=1, C2(y,el)=2, C2(el,perro)=2.
    p = [(2 + 1) / (4 + 4), (1 + 1) / (1 + 4), (2 + 1) / (2 + 4), (2 + 1) / (4 + 4)]
    want = sum(p) / 4
    assert out[6].avg_p == want
    assert out[6].n_bigrams == 4
    # unscored docs are absent
    assert 4 not in out and 5 not in out
    # every scored doc has a bucket from the fixed set
    assert {r.bucket for r in out.values()} <= {"head", "middle", "tail"}
    # ranks are 1..n per language without gaps
    for lang in ("en", "es"):
        ranks = sorted(r.lm_rank for r in out.values() if r.lang == lang)
        assert ranks == list(range(1, len(ranks) + 1))


def test_duckdb_parity_bitwise(spark):
    got = sorted(
        ((r.doc_id, r.lang, r.n_bigrams, r.avg_p, r.lm_rank, r.bucket)
         for r in _spark_rows(spark).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?,?)", ROWS)
    want = sorted(
        tuple(r) for r in
        con.execute("WITH " + sql_bigram_lm("docs")).fetchall()
    )
    # raw-double equality is the point: order-pinned IEEE folds match bitwise
    assert got == want


def test_tercile_sizes(spark):
    # 9 equally-spaced-score docs in one lang → exact 3/3/3 terciles
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(i + 2)), "en")
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = bigram_lm_scores(df).collect()
    from collections import Counter
    assert Counter(r.bucket for r in out) == {"head": 3, "middle": 3, "tail": 3}


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    plan = (
        bigram_lm_scores(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # vocabulary join is broadcast, not shuffled
    assert "BroadcastHashJoin" in plan
