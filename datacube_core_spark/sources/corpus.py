"""Deterministic dedup-test corpus: documents + planted duplicates.

The driver's documents table has fully distinct texts, so dedup operators
would trivially return nothing.  We plant, deterministically and
SQL-expressibly (same derivation in both engines):

* exact twins  — docs with doc_id % 7 == 0 duplicated verbatim
* near dups    — docs with doc_id % 9 == 0 duplicated with the last word
                 dropped (high-but-not-1 shingle Jaccard)

Planted ids live above PLANT_STRIDE so originals are recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLANT_EXACT = 10_000_000
PLANT_NEAR = 20_000_000

# anchored at end-of-string: at most one match, so Spark's replace-all and
# DuckDB's replace-first semantics agree
_LAST_WORD_RE = r"\s+\S+$"


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # the documents parquet is one small file -> one input split; spread the
    # rows so the downstream shingle explode parallelizes (local analog of a
    # many-file table)
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    exact = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(PLANT_EXACT)).alias("doc_id"), "text"
    )
    near = docs.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + F.lit(PLANT_NEAR)).alias("doc_id"),
        F.regexp_replace(F.col("text"), _LAST_WORD_RE, "").alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_EXACT} AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {PLANT_NEAR} AS doc_id,
         regexp_replace(text, '{_LAST_WORD_RE}', '') AS text
  FROM documents WHERE doc_id % 9 = 0
)
"""
