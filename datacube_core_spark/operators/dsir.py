"""DSIR-style importance weights — two-corpus hashed n-gram contrast.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public) scores raw web documents by how much more likely their hashed
n-gram features are under a TARGET distribution (a trusted corpus)
than under the RAW crawl distribution, then resamples by that weight.
The published estimator hashes n-grams into a FIXED bucket space so
the two distributions fit in bounded memory at any corpus size — that
boundedness is the whole point at 100 TB, and it is what this module
keeps: both feature tables have exactly ``n_buckets`` rows no matter
how big the corpora are.

Implementation, fully relational and float-portable (same discipline
as :mod:`.lm` — no ln/exp, only exact integer counts and order-pinned
IEEE ops, so the DuckDB twin matches bitwise):

1. features: each adjacent token pair hashes to
   ``md5_h32(w1 || ' ' || w2) mod n_buckets`` (the repo's cross-engine
   hash primitive, :func:`.dedup.md5_h32_col`);
2. bucket counts over the raw corpus (``cR``) and the target subset
   (``cT``), add-one smoothed;
3. per-feature likelihood ratio as ONE double division of two exact
   int64 products:
   ``r_b = ((cT_b + 1) · (NR + B)) / ((cR_b + 1) · (NT + B))``
   (algebraically equal to the smoothed-probability ratio; products
   stay far below 2⁶³ for any corpus this sandbox can hold — at true
   100 TB scale swap the two corpus totals into the ratio as doubles,
   one extra rounding, same plan);
4. per-document weight = position-ordered mean of its feature ratios
   (deterministic fold, exactly the :mod:`.lm` pattern); weights > 1
   mean "looks more like the target".

Scale shape: featurization is a shuffle-free map; the two count tables
aggregate with map-side combine to ``n_buckets`` rows and BROADCAST to
the per-doc join (hash buckets are uniform by construction — no skew);
the corpus totals are derived from the bucket tables themselves (no
extra scan).  The DSIR resampling step (Gumbel top-k) is downstream
sampling — the deterministic weight column is this operator's product.

Reference analog: none in ODC — webtext training-data op alongside
dedup/sampling/lm (SURVEY §2 extension family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_h32_col
from .lm import bigrams_df


def dsir_weights(docs: DataFrame, target: Column, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 4096) -> DataFrame:
    """Per-document importance weight of raw docs toward ``target``.

    ``target`` is a boolean Column over ``docs`` selecting the target
    subset (e.g. ``F.col('lang') == 'en'``).  Returns
    (id, n_feats, weight); docs with fewer than two tokens are
    unscored (absent), mirroring the SQL twin.
    """
    B = int(n_buckets)
    d = docs.withColumn("__is_t", target)
    big = bigrams_df(d, id_col, text_col, extra_cols=("__is_t",))
    # featurize ONCE and materialize: `feat` feeds both the bucket-count
    # aggregate and the per-doc score join — without this the tokenize +
    # explode + per-bigram md5 chain executes twice (guide §2.4/§5).
    # The checkpoint holds 4 narrow columns per bigram occurrence.
    feat = big.select(
        id_col, "__is_t", "pos",
        (md5_h32_col(F.concat_ws(" ", "w1", "w2")) % B).alias("b"),
    ).localCheckpoint(eager=False)
    cr = feat.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.col("__is_t").cast("long")).alias("ct"),
    )
    # corpus totals from the bucket table itself (B rows — no rescan)
    tot = cr.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    ratio = cr.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            ((F.col("ct") + 1) * (F.col("nr") + B))
            / ((F.col("cr") + 1) * (F.col("nt") + B))
        ).alias("r"),
    )
    scored = feat.join(F.broadcast(ratio), "b").select(id_col, "pos", "r")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_feats"),
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "r"))),
                F.lit(0.0),
                lambda acc, x: acc + x["r"],
            )
            / F.count("*")
        ).alias("weight"),
    )


def sql_dsir(src: str, target_sql: str, id_col: str = "doc_id",
             text_col: str = "text", n_buckets: int = 4096) -> str:
    """DuckDB twin ending in a SELECT with identical column names;
    ``target_sql`` is the boolean expression over ``src`` rows."""
    B = int(n_buckets)
    return f"""
ds_toks AS (
  SELECT {id_col}, ({target_sql}) AS is_t,
         list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),
                     x -> x <> '') AS t
  FROM {src}
),
ds_big AS (
  SELECT {id_col}, is_t, i AS pos,
         CAST(concat('0x', substr(md5((t[i] || ' ' || t[i + 1])), 1, 8)) AS BIGINT)
           % {B} AS b
  FROM ds_toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
),
ds_cr AS (
  SELECT b, COUNT(*) AS cr, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
  FROM ds_big GROUP BY b
),
ds_tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM ds_cr),
ds_ratio AS (
  SELECT b, ((ct + 1) * (nr + {B})) / ((cr + 1) * (nt + {B})) AS r
  FROM ds_cr, ds_tot
),
ds_sc AS (
  SELECT g.{id_col}, g.pos, ds_ratio.r
  FROM ds_big g JOIN ds_ratio USING (b)
)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       list_reduce(list(r ORDER BY pos), (a, b) -> a + b) / COUNT(*) AS weight
FROM ds_sc GROUP BY {id_col}"""
