"""In-corpus bigram language-model scoring → CCNet-style quality buckets.

The CCNet pipeline (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 — public) filters
web text by per-language LM score and splits each language into
head / middle / tail terciles.  This module reproduces that shape with
an LM trained ON the corpus itself, fully relationally:

1. whitespace tokens (the repo's proven ``functions/text.py``
   tokenization, twinned in DuckDB),
2. per-language bigram/context counts + vocabulary size,
3. add-one smoothed conditional probability
   ``p(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V)``,
4. per-document mean bigram probability,
5. per-language tercile buckets (head = most-probable third).

**Float determinism (the oracle contract):** the driver hash-compares
raw doubles, and ``ln``/``exp`` are NOT bitwise-portable between the
JVM and libm (measured: 297/1999 values differ by 1 ulp) — so the
score deliberately avoids transcendentals.  Everything is exact
integer counts until one double division per bigram, and the per-doc
sum folds in POSITION ORDER (``aggregate`` over a sorted array here,
``list_reduce(list(p ORDER BY pos), ...)`` in DuckDB) — each IEEE
add/divide is correctly rounded and order-pinned, so both engines
produce bitwise-identical doubles.  The mean probability ranks
documents the same way perplexity does for fixed doc length, and is
the published "mean word prob" LM-quality variant.

Scale shape (100 TB): token/bigram extraction is a shuffle-free map;
count tables get map-side partial aggregation; the big×C2 join
shuffles on (lang, w1, w2) — near-uniform keys; the big×C1 join on
(lang, w1) is Zipf-skewed ("the") — AQE skew-join splits it, and
``operators/skew.salted_agg`` is the manual fallback.  Vocabulary
sizes broadcast (one row per language).  The tercile window sorts per
language — at corpus scale, compute cutoffs on a sample instead
(exactly what CCNet does) and bucket by comparison; the exact window
here IS the oracle-checkable small-scale semantics.

Reference analog: none in ODC — webtext training-data op (SURVEY §2
extension family, alongside dedup/sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datacube_core_spark.functions.text import tokens_col


def _clean_tokens(text: Column) -> Column:
    return F.filter(tokens_col(text), lambda t: t != "")


def bigrams_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", extra_cols: tuple = ()) -> DataFrame:
    """(id, [extra...], pos, w1, w2) — one row per adjacent token pair.
    Shared by the LM scorer and the DSIR featurizer; shuffle-free map.
    Documents with fewer than two tokens emit nothing."""
    d = docs.select(id_col, *extra_cols, _clean_tokens(F.col(text_col)).alias("t"))
    # struct(pos, w1, w2) per adjacent pair; Spark SQL array indexing is
    # 0-based in expressions, so pair i is (t[i], t[i+1])
    pairs = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (w, i) -> struct(i AS pos, w AS w1, t[i + 1] AS w2))"
    )
    return (
        d.select(id_col, *extra_cols, F.explode(pairs).alias("b"))
        .select(id_col, *extra_cols, "b.pos", "b.w1", "b.w2")
    )


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Per-document LM score + tercile bucket.

    Returns (id, lang, n_bigrams, avg_p, lm_rank, bucket); documents
    with fewer than two tokens carry no bigram evidence and are not
    scored (absent from the output, same as the SQL twin).
    """
    # tokenize ONCE and materialize: the cleaned-token table feeds three
    # consumers (the bigram occurrence table twice — count build + score
    # join — and the vocabulary aggregate).  Without this the parquet
    # scan + regex split + explode chain executes four times (guide
    # §2.4/§5: the r7 plan audit counted 4 identical scan→Generate
    # subtrees).  The checkpoint holds one narrow row per doc.
    d = docs.select(
        id_col, lang_col, _clean_tokens(F.col(text_col)).alias("t")
    ).localCheckpoint(eager=False)
    pairs = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (w, i) -> struct(i AS pos, w AS w1, t[i + 1] AS w2))"
    )
    big = (
        d.select(id_col, lang_col, F.explode(pairs).alias("b"))
        .select(id_col, lang_col, "b.pos", "b.w1", "b.w2")
    )
    c2 = big.groupBy(lang_col, "w1", "w2").agg(F.count("*").alias("c2"))
    # context counts DERIVED from the bigram table (C1(w) = Σ_w2 C2(w,w2))
    # — the Zipf-skewed (lang, w1) join then runs over the AGGREGATED
    # table (rows bounded by distinct-successor counts, not occurrences),
    # and the big occurrence table is joined exactly ONCE
    c1 = c2.groupBy(lang_col, "w1").agg(F.sum("c2").alias("c1"))
    # SHUFFLE_HASH: the count table is the build side of the big×counts
    # join below.  Without the hint AQE's size estimates broadcast the
    # 4M-row OCCURRENCE side (BuildLeft — measured 7.7s warm, and a
    # driver-side collect that cannot exist at corpus scale); with it the
    # occurrence table shuffles once on the near-uniform (lang, w1, w2)
    # key and each partition builds a hash table over its aggregated
    # count rows (guide §3.1; 3.5s warm; AQE skew-split still applies).
    cj = c2.join(c1, [lang_col, "w1"]).hint("shuffle_hash")
    vocab = (
        d.select(lang_col, F.explode("t").alias("w"))
        .groupBy(lang_col).agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        big.join(cj, [lang_col, "w1", "w2"])
        .join(F.broadcast(vocab), [lang_col])
        .select(
            id_col, lang_col, "pos",
            ((F.col("c2") + 1) / (F.col("c1") + F.col("v"))).alias("p"),
        )
    )
    doc = scored.groupBy(id_col, lang_col).agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("sp"),
    ).select(
        id_col, lang_col, "n_bigrams",
        (F.col("sp") / F.col("n_bigrams")).alias("avg_p"),
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("avg_p").desc(), F.col(id_col))
    n = F.count("*").over(Window.partitionBy(lang_col))
    r = F.row_number().over(w)
    bucket = (
        F.when(3 * r <= n, F.lit("head"))
        .when(3 * r <= 2 * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return doc.select(
        id_col, lang_col, "n_bigrams", "avg_p",
        r.cast("long").alias("lm_rank"), bucket.alias("bucket"),
    )


def sql_bigram_lm(src: str, id_col: str = "doc_id", text_col: str = "text",
                  lang_col: str = "lang") -> str:
    """DuckDB twin: the same pipeline as CTEs ending in a SELECT with
    identical column names.  ``src`` is a table/CTE name providing
    (id, lang, text).  Fold order is pinned by
    ``list_reduce(list(p ORDER BY pos), ...)`` — DuckDB's left fold
    seeds with the first element, which equals the Spark fold's
    ``0.0 + p1`` exactly."""
    return f"""
lm_toks AS (
  SELECT {id_col}, {lang_col},
         list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),
                     x -> x <> '') AS t
  FROM {src}
),
lm_big AS (
  SELECT {id_col}, {lang_col}, i AS pos, t[i] AS w1, t[i + 1] AS w2
  FROM lm_toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
),
lm_c2 AS (SELECT {lang_col}, w1, w2, COUNT(*) AS c2 FROM lm_big GROUP BY ALL),
lm_c1 AS (SELECT {lang_col}, w1, COUNT(*) AS c1 FROM lm_big GROUP BY ALL),
lm_v AS (
  SELECT {lang_col}, COUNT(DISTINCT w) AS v
  FROM (SELECT {lang_col}, UNNEST(t) AS w FROM lm_toks) GROUP BY {lang_col}
),
lm_sc AS (
  SELECT b.{id_col}, b.{lang_col}, b.pos, (c2.c2 + 1) / (c1.c1 + lm_v.v) AS p
  FROM lm_big b
  JOIN lm_c2 c2 USING ({lang_col}, w1, w2)
  JOIN lm_c1 c1 USING ({lang_col}, w1)
  JOIN lm_v USING ({lang_col})
),
lm_doc AS (
  SELECT {id_col}, {lang_col}, COUNT(*) AS n_bigrams,
         list_reduce(list(p ORDER BY pos), (a, b) -> a + b) AS sp
  FROM lm_sc GROUP BY {id_col}, {lang_col}
),
lm_scored AS (
  SELECT {id_col}, {lang_col}, n_bigrams, sp / n_bigrams AS avg_p FROM lm_doc
)
SELECT {id_col}, {lang_col},
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       avg_p,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY {lang_col} ORDER BY avg_p DESC, {id_col}
       ) AS BIGINT) AS lm_rank,
       (CASE
          WHEN 3 * ROW_NUMBER() OVER (
            PARTITION BY {lang_col} ORDER BY avg_p DESC, {id_col})
            <= COUNT(*) OVER (PARTITION BY {lang_col}) THEN 'head'
          WHEN 3 * ROW_NUMBER() OVER (
            PARTITION BY {lang_col} ORDER BY avg_p DESC, {id_col})
            <= 2 * COUNT(*) OVER (PARTITION BY {lang_col}) THEN 'middle'
          ELSE 'tail' END) AS bucket
FROM lm_scored"""
