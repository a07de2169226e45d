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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path the task brief names.
# Coarse quantizer: deterministic Lloyd k-means (fixed seed/iterations)
# trained driver-side on a sample; centroids become plan-time literals, so
# the DuckDB twin reproduces cluster assignment bit-for-bit.
# ---------------------------------------------------------------------------

def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    sample_limit: int = 100_000,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic Lloyd k-means on a (sampled) collect of the vector
    table — at 100 TB you train the quantizer on a sample, never the full
    table; assignment stays distributed."""
    rows = vectors.select(vec_col).limit(sample_limit).collect()
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def _dist2_cols(vec: Column, cent: np.ndarray) -> List[Column]:
    """Squared distance to each centroid: ||x||² − 2·x·c + ||c||² with the
    literal parts precomputed — one fold per centroid, same op order as
    the SQL twin."""
    x2 = dot_col(vec, vec)
    out = []
    for c in cent:
        arr = F.array(*[F.lit(float(w)) for w in c])
        c2 = float(np.dot(c, c))
        out.append(x2 - F.lit(2.0) * dot_col(vec, arr) + F.lit(c2))
    return out


def ivf_assign_col(vec: Column, cent: np.ndarray) -> Column:
    """argmin centroid index (1-based to mirror DuckDB list_position)."""
    ds = _dist2_cols(vec, cent)
    arr = F.array(*ds)
    return F.array_position(arr, F.array_min(arr)).cast("int")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """IVF ANN top-k: vectors bucketed by nearest centroid (one shuffle
    key), queries probe their ``n_probe`` nearest centroid lists, exact
    cosine rerank within the probed lists.  The big side shuffles on the
    list id; queries broadcast — same shape as the LSH path."""
    v = vectors.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    v = v.withColumn("lst", ivf_assign_col(F.col("v"), centroids)).withColumn(
        "na", norm_col(F.col("v"))
    )

    q = queries.select(F.col(query_id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
    qd = _dist2_cols(F.col("qv"), centroids)
    pairs_arr = F.array(
        *[F.struct(qd[i].alias("d"), F.lit(i + 1).alias("lst")) for i in range(len(centroids))]
    )
    probes = F.slice(F.array_sort(pairs_arr), 1, n_probe)
    q = q.withColumn("lst", F.explode(F.transform(probes, lambda s: s["lst"]))).withColumn(
        "nb", norm_col(F.col("qv"))
    )

    pairs = v.join(F.broadcast(q.select("qid", "qv", "nb", "lst")), on="lst")
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_col(F.col("v"), F.col("qv")) / den).otherwise(F.lit(0.0))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        pairs.select("qid", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def sql_ivf_topk(centroids: np.ndarray, k: int = 10, n_probe: int = 2, qmod: int = 50) -> str:
    """DuckDB twin of :func:`ivf_topk` over ``embeddings``."""
    def dists(e: str) -> str:
        terms = []
        for c in centroids:
            arr = "[" + ", ".join(_sql_double(w) for w in c) + "]"
            c2 = _sql_double(float(np.dot(c, c)))
            terms.append(
                f"list_dot_product({e}, {e}) - 2.0 * list_dot_product({e}, {arr}) + {c2}"
            )
        return "[" + ", ".join(terms) + "]"

    cos = _sql_cos("v.e", "q.e")
    return f"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
v AS (
  SELECT vec_id, e,
         CAST(list_position({dists('e')}, list_min({dists('e')})) AS INT) AS lst
  FROM base
),
qd AS (
  SELECT vec_id AS qid, e, {dists('e')} AS ds FROM base WHERE vec_id % {qmod} = 0
),
qp AS (
  SELECT qid, e, g.i AS lst
  FROM qd, UNNEST(generate_series(1, {len(centroids)})) AS g(i)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ds[g.i], g.i) <= {n_probe}
),
cand AS (
  SELECT q.qid, v.vec_id, {cos} AS cos_sim
  FROM v JOIN qp q ON v.lst = q.lst
)
SELECT qid, vec_id, cos_sim, rank FROM (
  SELECT qid, vec_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
  FROM cand
) WHERE rank <= {k}
"""


_IVF_CACHE: dict = {}


def ivf_centroids_fixture(
    path: str = "/root/testdata/sf0.01/embeddings.parquet",
    k: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic centroids trained once from a fixed parquet (pyarrow,
    no Spark) — the quantizer is a TRAINING ARTIFACT shared as literals by
    the Spark plan and the DuckDB twin, so assignment parity holds on any
    input (training data affects recall, never correctness)."""
    key = (path, k, iters, seed)
    got = _IVF_CACHE.get(key)
    if got is not None:
        return got
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    _IVF_CACHE[key] = cent
    return cent


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023 shape): k-means
# cluster the embedding space with the SAME deterministic coarse
# quantizer the IVF path uses, then drop, within each cluster, every item
# that has a kept-priority (lower-id) neighbour above a cosine threshold.
# The cluster assignment bounds the quadratic pair term to per-cluster
# populations — the published algorithm's own scale trick: at corpus
# size n with k lists the join costs Σ|c_i|² ≪ n², and the operator
# never forms a cross-cluster pair.  One shuffle on the list id
# (co-located self-join); `dropped` is DISTINCT'd before the anti-join
# so a many-duplicate item contributes one row, not one per witness.
# ---------------------------------------------------------------------------


def semdedup_kept(
    vectors: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rows that SURVIVE semantic dedup: ``(vec_id, lst)`` where ``lst``
    is the 1-based quantizer list.  Drop rule (deterministic, engine-
    twinnable): an item is dropped iff some SAME-CLUSTER item with a
    smaller id has cosine ≥ ``threshold`` to it — the keep-one-
    representative-per-semantic-group rule with id as the keep priority.
    Same cosine op order as the IVF/LSH paths so the DuckDB twin is
    bit-faithful."""
    v = vectors.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    v = (
        v.withColumn("lst", ivf_assign_col(F.col("v"), centroids))
        .withColumn("n", norm_col(F.col("v")))
    )
    a = v.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"), "lst")
    b = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "lst")
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_col(F.col("va"), F.col("vb")) / den).otherwise(F.lit(0.0))
    dropped = (
        a.join(b, on="lst")
        .where(F.col("a") < F.col("b"))
        .where(cos >= F.lit(float(threshold)))
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return v.join(dropped, on="vec_id", how="left_anti").select("vec_id", "lst")


def sql_semdedup(
    centroids: np.ndarray,
    threshold: float = 0.9,
    source_cte: str = "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
    source_name: str = "base",
) -> str:
    """DuckDB twin of :func:`semdedup_kept` over a CTE exposing
    ``(vec_id, e DOUBLE[])`` (defaults to the raw ``embeddings`` view)."""
    def dists(e: str) -> str:
        terms = []
        for c in centroids:
            arr = "[" + ", ".join(_sql_double(w) for w in c) + "]"
            c2 = _sql_double(float(np.dot(c, c)))
            terms.append(
                f"list_dot_product({e}, {e}) - 2.0 * list_dot_product({e}, {arr}) + {c2}"
            )
        return "[" + ", ".join(terms) + "]"

    cos = _sql_cos("a.e", "b.e")
    return f"""WITH {source_cte.strip().rstrip(',')},
v AS (
  SELECT vec_id, e,
         CAST(list_position({dists('e')}, list_min({dists('e')})) AS INT) AS lst
  FROM {source_name}
),
drp AS (
  SELECT DISTINCT b.vec_id
  FROM v a JOIN v b ON a.lst = b.lst AND a.vec_id < b.vec_id
  WHERE {cos} >= {_sql_double(float(threshold))}
)
SELECT v.vec_id, v.lst FROM v ANTI JOIN drp USING (vec_id)
"""
