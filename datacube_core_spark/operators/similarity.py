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


# ---------------------------------------------------------------------------
# Vectorized sequential-fold kernels (guide §4.2).
#
# The Catalyst higher-order ``aggregate(zip_with(...))`` fold above is
# interpreted per row-pair (no whole-stage codegen for HOFs) — measured as
# the dominant cost of every similarity operator.  These Arrow kernels
# compute the IDENTICAL left fold vectorized over rows: the dim loop runs
# ``acc = acc + (a_i * b_i)`` as elementwise numpy ops, so each row's
# result is the same correctly-rounded IEEE sequence the Catalyst fold
# (and the DuckDB twin's list_dot_product oracle contract) produces —
# bitwise-equal doubles, orders of magnitude less per-row overhead.  All
# decision floats (cosines, distances, norms) keep exact op order.
# ---------------------------------------------------------------------------


def _mat(values) -> np.ndarray:
    """(n, d) float64 matrix from a pandas Series of list/array cells."""
    if len(values) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.array([np.asarray(x, dtype=np.float64) for x in values], dtype=np.float64)


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise sequential-fold dot product: bitwise-identical to
    ``aggregate(zip_with(a, b, (x,y)->x*y), 0.0, (acc,v)->acc+v)``."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for i in range(a.shape[1]):
        acc += a[:, i] * b[:, i]
    return acc


def _seq_dot_const(a: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Row-wise sequential fold of ``a · c`` for a constant vector c."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for i in range(a.shape[1]):
        acc += a[:, i] * c[i]
    return acc


def _pair_cos_udf():
    """pandas UDF: cos = dot/(na*nb) with the sequential-fold dot,
    0.0 when the denominator is not > 0 — same op order as
    :func:`cosine_col` / the oracle twins, batch-evaluated."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va, na, vb, nb):  # type: ignore[no-untyped-def]
        a, b = _mat(va), _mat(vb)
        num = _seq_dot(a, b)
        den = na.to_numpy(dtype=np.float64) * nb.to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0.0, num / den, 0.0)
        return pd.Series(out)

    return _cos


def _ivf_dists(v: np.ndarray, cent: np.ndarray) -> tuple:
    """(x², D) where D[:, j] = (x² − 2·(v·c_j)) + |c_j|², every term in
    the exact order of :func:`_dist2_cols` (|c_j|² is the same
    ``float(np.dot(c, c))`` literal the Catalyst/SQL dialects embed)."""
    c2 = [float(np.dot(c, c)) for c in cent]
    x2 = _seq_dot(v, v)
    d = np.empty((v.shape[0], len(cent)), dtype=np.float64)
    for j, c in enumerate(cent):
        d[:, j] = (x2 - 2.0 * _seq_dot_const(v, np.asarray(c, dtype=np.float64))) + c2[j]
    return x2, d


def _schema_plus(df: DataFrame, *fields: str):
    """Input schema plus ``"name type"`` columns (kernel output schemas)."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    out = StructType(list(df.schema.fields))
    for f in fields:
        name, typ = f.split(" ", 1)
        out.add(name, _parse_datatype_string(typ))
    return out


def _with_ivf_assign(df: DataFrame, cent: np.ndarray, vec_col: str,
                     norm_name: str | None = None) -> DataFrame:
    """mapInPandas twin of :func:`ivf_assign_col` (+ optional norm):
    1-based argmin list id, first-min tie-break like array_position."""
    cent = np.asarray(cent, dtype=np.float64)
    extra = ["lst int"] + ([f"{norm_name} double"] if norm_name else [])
    schema = _schema_plus(df, *extra)

    def fn(it):
        for pdf in it:
            v = _mat(pdf[vec_col])
            if len(pdf) == 0:
                x2 = np.zeros(0)
                lst = np.zeros(0, dtype="int32")
            else:
                x2, d = _ivf_dists(v, cent)
                lst = (np.argmin(d, axis=1) + 1).astype("int32")
            out = pdf.copy()
            out["lst"] = lst
            if norm_name:
                out[norm_name] = np.sqrt(x2)
            yield out

    return df.mapInPandas(fn, schema)


def _ivf_probe_rows(df: DataFrame, cent: np.ndarray, n_probe: int,
                    vec_col: str, norm_name: str) -> DataFrame:
    """mapInPandas twin of the query-side probe explode: for each row,
    the ``n_probe`` nearest lists in ``slice(array_sort(struct(d, lst)))``
    order (stable argsort over d == struct sort, ties by lst asc)."""
    import pandas as pd

    cent = np.asarray(cent, dtype=np.float64)
    schema = _schema_plus(df, "lst int", f"{norm_name} double")

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                out = pdf.copy()
                out["lst"] = np.zeros(0, dtype="int32")
                out[norm_name] = np.zeros(0)
                yield out
                continue
            v = _mat(pdf[vec_col])
            x2, d = _ivf_dists(v, cent)
            order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
            idx = np.repeat(np.arange(len(pdf)), n_probe)
            out = pdf.iloc[idx].reset_index(drop=True)
            out["lst"] = (order + 1).astype("int32").ravel()
            out[norm_name] = np.sqrt(x2)[idx]
            yield out

    return df.mapInPandas(fn, schema)


def _with_norm(df: DataFrame, vec_col: str, norm_name: str) -> DataFrame:
    """mapInPandas twin of :func:`norm_col`: sqrt of the sequential-fold
    self-dot."""
    schema = _schema_plus(df, f"{norm_name} double")

    def fn(it):
        for pdf in it:
            v = _mat(pdf[vec_col])
            out = pdf.copy()
            out[norm_name] = np.sqrt(_seq_dot(v, v)) if len(pdf) else np.zeros(0)
            yield out

    return df.mapInPandas(fn, schema)


def _with_lsh_code(df: DataFrame, planes: np.ndarray, vec_col: str,
                   code_name: str = "code",
                   norm_name: str | None = None) -> DataFrame:
    """mapInPandas twin of :func:`lsh_code_col` (+ optional norm):
    bit i set iff the sequential-fold ``v · plane_i`` is >= 0."""
    planes = np.asarray(planes, dtype=np.float64)
    extra = [f"{code_name} long"] + ([f"{norm_name} double"] if norm_name else [])
    schema = _schema_plus(df, *extra)

    def fn(it):
        for pdf in it:
            v = _mat(pdf[vec_col])
            code = np.zeros(len(pdf), dtype=np.int64)
            for i, plane in enumerate(planes):
                if len(pdf):
                    code += np.where(_seq_dot_const(v, plane) >= 0.0,
                                     np.int64(1 << i), np.int64(0))
            out = pdf.copy()
            out[code_name] = code
            if norm_name:
                out[norm_name] = np.sqrt(_seq_dot(v, v)) if len(pdf) else np.zeros(0)
            yield out

    return df.mapInPandas(fn, schema)


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
    # to the naive form (and to the DuckDB oracle).  This operator stays
    # on the Catalyst fold: at its |Q|-bounded pair volume the
    # interpreted fold beat the Arrow kernel round-trip (r7: 0.92s vs
    # 1.54s) — the vectorized path wins only on the big bucketed joins.
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
    v = _with_lsh_code(v, planes, "v", "code", "na")

    q = queries.select(F.col(query_id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
    q = _with_lsh_code(q, planes, "qv", "code0", "nb")
    # multiprobe: original code + all codes within hamming distance 1
    probes = [F.col("code0")]
    if probe_hamming >= 1:
        probes += [F.col("code0").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    q = q.withColumn("code", F.explode(F.array(*probes)))

    pairs = v.join(F.broadcast(q.select("qid", "qv", "nb", "code")), on="code")
    cos = _pair_cos_udf()(F.col("v"), F.col("na"), F.col("qv"), F.col("nb"))
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
    # code + norm computed ONCE per vector and materialized: the coded
    # table feeds both join sides (probe-exploded left, plain right) —
    # un-checkpointed, the code kernel would run twice
    v = _with_lsh_code(v, planes, "v", "code0", "n0").localCheckpoint(eager=False)
    probes = [F.col("code0")] + [F.col("code0").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    exploded = v.withColumn("code", F.explode(F.array(*probes)))

    left = exploded.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("n0").alias("na"), "code")
    right = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("n0").alias("nb"), F.col("code0").alias("code"))
    cand = (
        left.join(right, "code").where(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb", "na", "nb").distinct()
    )
    cos = _pair_cos_udf()(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
    return (
        cand.withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= F.lit(threshold))
        .select("a", "b", "cos_sim")
    )


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
    v = _with_ivf_assign(v, centroids, "v", "na")

    q = queries.select(F.col(query_id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
    q = _ivf_probe_rows(q, centroids, n_probe, "qv", "nb")

    pairs = v.join(F.broadcast(q.select("qid", "qv", "nb", "lst")), on="lst")
    cos = _pair_cos_udf()(F.col("v"), F.col("na"), F.col("qv"), F.col("nb"))
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
    # assignment + norm computed ONCE and materialized: `v` feeds both
    # self-join sides AND the final anti-join — un-checkpointed, the
    # quantizer kernel ran three times (guide §2.4/§5)
    v = _with_ivf_assign(v, centroids, "v", "n").localCheckpoint(eager=False)
    a = v.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"), "lst")
    b = v.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "lst")
    cos = _pair_cos_udf()(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
    dropped = (
        a.join(b, on="lst")
        .where(F.col("a") < F.col("b"))
        .withColumn("__cos", cos)
        .where(F.col("__cos") >= F.lit(float(threshold)))
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
