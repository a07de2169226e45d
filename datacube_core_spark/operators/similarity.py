"""Similarity search over an embedding column (task-brief first-class op).

* :func:`brute_force_topk` — exact cosine top-k per query vector; the
  dot product is a Catalyst ``aggregate(zip_with(...))`` left fold in
  DOUBLE (JVM-side, deterministic order — bit-matchable against a DuckDB
  oracle using the same fold).
* :func:`lsh_topk` — random-hyperplane LSH bucketing: vectors hashed to
  sign-bit codes, candidates share a code (probing neighbor codes within
  Hamming 1), exact rerank inside buckets.  The scale path: the big side
  shuffles on the code, queries broadcast.
* :func:`cosine_neardup_pairs` — all pairs with cosine ≥ threshold
  (embedding near-dup dedup mode) via the same bucketing.

Embeddings arrive as ``array<float>``; all math is done after casting to
double (float32 values are exactly representable, so both engines see
identical inputs).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-fold dot product in double (deterministic order).

    With ``dim`` given, unrolls to an explicit left-associated sum of
    products; measured SLOWER than the fold here (the 64-term getItem
    tree blows past codegen limits), so callers default to the fold —
    kept because the two forms are bit-identical (same addition order)
    and the unrolled one can win for small dims."""
    if dim is not None:
        # start from 0.0 exactly like the fold (guards the -0.0 corner:
        # 0.0 + -0.0 == +0.0, while a bare first term could keep -0.0)
        acc = F.lit(0.0) + a.getItem(0) * b.getItem(0)
        for i in range(1, dim):
            acc = acc + a.getItem(i) * b.getItem(i)
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot_col(a, a, dim))


def with_unit_vec(df: DataFrame, vec_col: str = "embedding", out_col: str = "uvec") -> DataFrame:
    v = _dvec(F.col(vec_col))
    n = norm_col(v)
    unit = F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    return df.withColumn(out_col, unit)


def cosine_col(a: Column, b: Column) -> Column:
    """cos = dot/(|a||b|), 0 for zero vectors; operand order fixed for
    cross-engine bit parity."""
    num = dot_col(a, b)
    den = norm_col(a) * norm_col(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, cos_sim, rank).

    The query side is broadcast (small); the vector side streams — at
    scale this is a map-only pass + per-query top-k (no full sort).
    """
    # norms are precomputed per vector (NOT per pair) — the final
    # expression dot/(na*nb) is unchanged, so results stay bit-identical
    # to the naive form (and to the DuckDB oracle)
    v = vectors.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    v = v.withColumn("na", norm_col(F.col("v"), dim))
    q = queries.select(F.col(query_id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
    q = q.withColumn("nb", norm_col(F.col("qv"), dim))
    pairs = v.crossJoin(F.broadcast(q))
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_col(F.col("v"), F.col("qv"), dim) / den).otherwise(F.lit(0.0))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        pairs.select("qid", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_code_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit code: bit i = (vec · plane_i) >= 0 (pure Catalyst)."""
    bits = []
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        d = dot_col(vec, arr)
        bits.append(F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    code = bits[0]
    for b in bits[1:]:
        code = code + b
    return code


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: bucket on hyperplane code, multiprobe
    neighbor codes (Hamming ≤ probe_hamming), exact rerank in-bucket."""
    planes = _hyperplanes(dim, n_bits)
    v = vectors.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    v = v.withColumn("code", lsh_code_col(F.col("v"), planes))

    q = queries.select(F.col(query_id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
    q = q.withColumn("code0", lsh_code_col(F.col("qv"), planes))
    # multiprobe: original code + all codes within hamming distance 1
    probes = [F.col("code0")]
    if probe_hamming >= 1:
        probes += [F.col("code0").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    q = q.withColumn("code", F.explode(F.array(*probes)))

    v = v.withColumn("na", norm_col(F.col("v")))
    q = q.withColumn("nb", norm_col(F.col("qv")))
    pairs = v.join(F.broadcast(q.select("qid", "qv", "nb", "code")), on="code")
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_col(F.col("v"), F.col("qv")) / den).otherwise(F.lit(0.0))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        pairs.select("qid", "vec_id", cos.alias("cos_sim"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) pairs with cosine ≥ threshold (a < b), LSH-bucketed with
    Hamming-1 probing, exact cosine verification."""
    planes = _hyperplanes(dim, n_bits)
    v = vectors.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    v = v.withColumn("code0", lsh_code_col(F.col("v"), planes))
    probes = [F.col("code0")] + [F.col("code0").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    exploded = v.withColumn("code", F.explode(F.array(*probes)))

    v = v.withColumn("n0", norm_col(F.col("v")))
    exploded = exploded.withColumn("n0", norm_col(F.col("v")))
    left = exploded.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("n0").alias("na"), "code")
    right = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("n0").alias("nb"), F.col("code0").alias("code"))
    cand = (
        left.join(right, "code").where(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb", "na", "nb").distinct()
    )
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_col(F.col("va"), F.col("vb")) / den).otherwise(F.lit(0.0))
    return cand.select("a", "b", cos.alias("cos_sim")).where(F.col("cos_sim") >= F.lit(threshold))


# ---------------------------------------------------------------------------
# DuckDB SQL twins (hyperplane weights are plan-time literals, so the
# oracle reproduces the exact sign-bit codes; candidate rule "probe codes
# within Hamming 1" ≡ bit_count(xor(code_a, code_b)) <= 1)
# ---------------------------------------------------------------------------

def _sql_double(x: float) -> str:
    return repr(float(x))


def sql_lsh_code(e_expr: str, planes: np.ndarray) -> str:
    """DuckDB twin of :func:`lsh_code_col` for a DOUBLE[] expression."""
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(_sql_double(w) for w in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({e_expr}, {arr}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _sql_cos(a: str, b: str) -> str:
    den = f"sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))"
    return f"CASE WHEN {den} > 0 THEN list_dot_product({a}, {b}) / ({den}) ELSE 0.0 END"


def sql_lsh_topk(k: int = 10, n_bits: int = 12, dim: int = 64, qmod: int = 50) -> str:
    """DuckDB twin of :func:`lsh_topk` over the ``embeddings`` table with
    queries = vec_id % qmod == 0."""
    code = sql_lsh_code("e", _hyperplanes(dim, n_bits))
    cos = _sql_cos("c.e", "q.e")
    return f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (SELECT vec_id, e, {code} AS code FROM v),
q AS (SELECT vec_id AS qid, e, code FROM c WHERE vec_id % {qmod} = 0),
cand AS (
  SELECT q.qid, c.vec_id, {cos} AS cos_sim
  FROM c JOIN q ON bit_count(xor(c.code, q.code)) <= 1
)
SELECT qid, vec_id, cos_sim, rank FROM (
  SELECT qid, vec_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM cand
) WHERE rank <= {k}
"""


def sql_cosine_neardup(source_cte: str, source_name: str, threshold: float = 0.9, n_bits: int = 8, dim: int = 64) -> str:
    """DuckDB twin of :func:`cosine_neardup_pairs` over a CTE exposing
    (vec_id, e DOUBLE[])."""
    code = sql_lsh_code("e", _hyperplanes(dim, n_bits))
    cos = _sql_cos("a.e", "b.e")
    return f"""WITH {source_cte.strip()},
c AS (SELECT vec_id, e, {code} AS code FROM {source_name})
SELECT a.vec_id AS a, b.vec_id AS b, {cos} AS cos_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id AND bit_count(xor(a.code, b.code)) <= 1
WHERE {cos} >= {threshold}
"""
