"""Deterministic embedding near-dup corpus: vectors + planted near-twins.

The driver's embeddings table holds random vectors whose pairwise cosines
sit far below any near-dup threshold, so an embedding-dedup operator would
trivially return nothing.  We plant, deterministically and SQL-expressibly
(same float arithmetic in both engines):

* near twins — vectors with vec_id % 37 == 0 duplicated with +0.25 added
  to the first component only (cosine ≈ 0.999 against the original for
  unit-scale embeddings — near, not identical).

Planted ids live above PLANT_VEC so originals are recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLANT_VEC = 1_000_000
_DIM = 64


def neardup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    twins = emb.where(F.col("vec_id") % 37 == 0).select(
        (F.col("vec_id") + F.lit(PLANT_VEC)).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(0.25)),
            F.slice("embedding", 2, _DIM - 1),
        ).alias("embedding"),
    )
    return emb.unionByName(twins)


NEARDUP_CTE = f"""
neardup AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_VEC} AS vec_id, list_concat([e[1] + 0.25], e[2:]) AS e
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
  WHERE vec_id % 37 = 0
)
"""
