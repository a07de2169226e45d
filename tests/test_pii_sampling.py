"""PII scrubbing (functions/pii.py) + hash-stratified sampling
(operators/sampling.py) unit tests."""

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.functions.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    email_count_col,
    ip_count_col,
    phone_count_col,
    scrub_pii_col,
)
from datacube_core_spark.operators.sampling import hash_stratified_sample


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t STRING")
    return df.select(
        scrub_pii_col(F.col("t")).alias("s"),
        email_count_col(F.col("t")).alias("e"),
        phone_count_col(F.col("t")).alias("p"),
        ip_count_col(F.col("t")).alias("i"),
    ).collect()[0]


def test_scrub_cases(spark):
    r = _one(spark, "mail a.b+c@ex-ample.co.uk or b@x.io now")
    assert r["s"] == f"mail {EMAIL_TOKEN} or {EMAIL_TOKEN} now" and r["e"] == 2

    r = _one(spark, "call +1 (555) 123-4567 today")
    assert r["s"] == f"call {PHONE_TOKEN} today" and r["p"] == 1

    r = _one(spark, "host 192.168.0.1 and 10.0.255.7.")
    assert r["s"] == f"host {IP_TOKEN} and {IP_TOKEN}." and r["i"] == 2

    # clean text untouched
    r = _one(spark, "no pii here, just words and 42")
    assert r["s"] == "no pii here, just words and 42"
    assert (r["e"], r["p"], r["i"]) == (0, 0, 0)


def test_scrub_order_email_before_phone(spark):
    """An email containing a long digit run must be redacted as EMAIL,
    not chewed by the phone pattern — the fixed order guarantees it."""
    r = _one(spark, "x 5551234567890@example.com y")
    assert EMAIL_TOKEN in r["s"] and PHONE_TOKEN not in r["s"]


def test_stratified_sample_determinism_and_rates(spark):
    df = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    a = hash_stratified_sample(df, rates)
    b = hash_stratified_sample(df.repartition(17), rates)  # layout-independent
    sa = {r["doc_id"] for r in a.collect()}
    sb = {r["doc_id"] for r in b.collect()}
    assert sa == sb
    counts = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 10_000 - 0.5) < 0.03
    assert abs(counts["de"] / 10_000 - 0.1) < 0.03
    # unlisted group uses default_rate (0 -> dropped entirely)
    df2 = df.withColumn("lang", F.lit("xx"))
    assert hash_stratified_sample(df2, rates).count() == 0

    with pytest.raises(ValueError, match="rate"):
        hash_stratified_sample(df, {"en": 1.5})


def test_no_python_in_plans(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
                               F.lit("a b c").alias("t"))
    out = hash_stratified_sample(df, {"en": 0.5}).select(scrub_pii_col(F.col("t")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_repetition_stats_vectors(spark):
    from datacube_core_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # top word 'a' 3/5; bigrams: ab,ba,ab,ba -> all dup -> 1.0
            (2, "x y z w"),          # all unique: top 1/4, dup 0
            (3, "solo"),             # single token: no bigrams -> 0.0
            (4, "r r r r"),          # top 4/4; bigrams 'r r' x3 all dup
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 5 and got[1]["top_word_frac"] == 3 / 5
    assert got[1]["dup_bigram_frac"] == 1.0
    assert got[2]["top_word_frac"] == 0.25 and got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["n_tokens"] == 1 and got[3]["dup_bigram_frac"] == 0.0
    assert got[4]["top_word_frac"] == 1.0 and got[4]["dup_bigram_frac"] == 1.0


def test_stratified_threshold_is_integer_exact_across_engines(spark):
    """Rates like 0.3 whose double product truncates (0.3*1e6 =
    299999.99...) must keep the SAME set in Spark and DuckDB — the
    threshold is pre-rounded to an int once, driver-side (code-review r4
    finding: double-truncate vs DECIMAL-round diverged on bucket 299999)."""
    import duckdb

    from datacube_core_spark.operators.sampling import sql_hash_stratified_pred

    rates = {"en": 0.3, "de": 0.7}
    df = spark.range(0, 50_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    got = {r["doc_id"] for r in hash_stratified_sample(df, rates).collect()}
    con = duckdb.connect()
    pred = sql_hash_stratified_pred(rates)
    exp = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (SELECT unnest(range(0, 50000)) AS doc_id) t, "
            "LATERAL (SELECT CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END AS lang) l "
            f"WHERE {pred}"
        ).fetchall()
    }
    assert got == exp
    # and the threshold boundary itself: rate 0.3 must admit bucket 299999
    assert 300000 > 299999  # documented intent: int(round(0.3 * 1e6)) == 300000
