"""Deduplication suite over the documents corpus (task-brief first-class ops).

All hot-path computation stays JVM-side (Catalyst higher-order functions +
``xxhash64``); there are NO Python UDFs in any of these pipelines — the
sketches (minhash, simhash) are computed with explode + aggregate plans,
which scale as ordinary shuffles.

* exact dedup        — group by content fingerprint (md5 of normalized text)
* n-gram Jaccard     — exact pairwise similarity via shingle equi-join
                       (SQL-expressible → oracle-checked)
* MinHash + LSH      — 64-perm minhash over shingle hashes, banded LSH
                       candidate generation, exact-Jaccard verification
* SimHash            — 64-bit per-token-hash majority sketch + Hamming
                       blocking for near-dup candidates

Reference analog: ODC's duplicate-detection self-join
(``drivers/postgres/_api.py:727-800``) is the exact-dedup shape; the
sketch-based operators are the web-scale extension the task brief adds.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_col

# ---------------------------------------------------------------------------
# shingling (pure Catalyst)
# ---------------------------------------------------------------------------

def shingles_col(text_col, n: int = 3):
    """Distinct word n-gram shingles of lowercased text as an array column."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n_grams = F.size(toks) - (n - 1)
    sz = F.greatest(n_grams, F.lit(0))
    # zip_with over n shifted length-aligned slices — ~4x faster than the
    # per-index slice+array_join form (measured; per-element element_at is
    # ~3x slower still)
    grams = F.slice(toks, 1, sz)
    for i in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, i + 1, sz), lambda a, b: F.concat_ws(" ", a, b))
    empty = F.array().cast("array<string>")
    return F.when(n_grams >= 1, F.array_distinct(grams)).otherwise(empty)


def with_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, distinct shingle): the substrate for Jaccard and
    minhash.  ``n_sh`` carries each doc's distinct-shingle count —
    computed from the array BEFORE the explode (single pass, no join)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), n).alias("_shs")
    ).withColumn("n_sh", F.size("_shs"))
    return base.select("doc_id", "n_sh", F.explode("_shs").alias("shingle"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-identical groups: fingerprint → (n, keeper=min id, max id)."""
    return (
        docs.select(fingerprint_col(F.col(text_col)).alias("fp"), F.col(id_col).alias("doc_id"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"), F.max("doc_id").alias("dup_max"))
        .where(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (brute-force oracle-checkable path)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All (a, b) doc pairs with shingle-Jaccard ≥ threshold, a < b.

    Relational plan: shingle equi-join → per-pair intersection count →
    |A∪B| = n_a + n_b − common.  The shingle join is the standard
    set-similarity join; skew on ultra-common shingles is handled by AQE
    (and at 100 TB by dropping top-frequency shingles — df-cut — before
    the join, which preserves recall for high thresholds).
    """
    sh = with_shingles(docs, n, id_col, text_col)
    a = sh.select(F.col("doc_id").alias("a"), "shingle", F.col("n_sh").alias("n_a"))
    b = sh.select(F.col("doc_id").alias("b"), "shingle", F.col("n_sh").alias("n_b"))
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
    return common.select("a", "b", jac.alias("jaccard")).where(F.col("jaccard") >= F.lit(threshold))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 64 fixed permutation parameters (deterministic; a < 2^30 keeps
# a*h32 + b < 2^62, no int64 overflow JVM-side)
_MH_PRIME = 4294967291  # largest 32-bit prime
_MH_K = 64


def _perm_params(k: int = _MH_K) -> List[Tuple[int, int]]:
    params = []
    a, b = 1103515245, 12345
    x = 42
    for _ in range(k):
        x = (a * x + b) % (1 << 30)
        pa = x | 1  # odd, < 2^30
        x = (a * x + b) % (1 << 30)
        pb = x
        params.append((pa, pb))
    return params


def _signatures_from_shingles(sh: DataFrame, k: int = _MH_K) -> DataFrame:
    """(doc_id, sig) from a (doc_id, shingle) DataFrame: h32 = xxhash64 &
    0xffffffff → k parallel min-aggregates of (a_k·h32 + b_k) mod p."""
    h32 = (F.xxhash64(F.col("shingle")) % F.lit(1 << 32) + F.lit(1 << 32)) % F.lit(1 << 32)
    hashed = sh.select("doc_id", h32.alias("h"))
    aggs = [
        F.min((F.col("h") * F.lit(pa) + F.lit(pb)) % F.lit(_MH_PRIME)).alias(f"m{i}")
        for i, (pa, pb) in enumerate(_perm_params(k))
    ]
    sig = hashed.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def minhash_signatures(docs: DataFrame, n: int = 3, k: int = _MH_K, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>[k]) — minhash over xxhash64 shingle hashes.
    Entirely JVM."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
    )
    return _signatures_from_shingles(sh, k)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
    k: int = _MH_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded LSH over minhash signatures.

    bands=16 × rows=4 (k=64) targets recall ≈ 1-(1-t^4)^16 (~0.99 at
    t=0.7, ~0.86 at t=0.5).  Candidates are verified with exact
    shingle-Jaccard so precision is exact; output is (a, b, jaccard).
    """
    rows = k // bands
    # one shingle pass shared by the signature build AND the exact-Jaccard
    # verification (localCheckpoint: cheap materialization, avoids
    # recomputing the corpus + shingling twice)
    sh = with_shingles(docs, n, id_col, text_col).localCheckpoint(eager=False)
    sig = _signatures_from_shingles(sh.select("doc_id", "shingle"), k)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.hash(*[F.col("sig")[bi * rows + j] for j in range(rows)]).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    left = banded.select(F.col("doc_id").alias("a"), "band", "bh")
    right = banded.select(F.col("doc_id").alias("b"), "band", "bh")
    cand = (
        left.join(right, ["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if not verify:
        return cand

    a = sh.select(F.col("doc_id").alias("a"), "shingle", F.col("n_sh").alias("n_a"))
    b = sh.select(F.col("doc_id").alias("b"), "shingle", F.col("n_sh").alias("n_b"))
    common = (
        a.join(b, "shingle")
        .join(cand, ["a", "b"], "left_semi")
        .groupBy("a", "b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
    return common.select("a", "b", jac.alias("jaccard")).where(F.col("jaccard") >= F.lit(threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col_aggs(k: int = 64):
    """64 per-bit majority sums over token hash ``h`` (helper)."""
    return [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(k)
    ]


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): per-token xxhash64, bitwise majority vote.

    JVM-only plan: explode tokens → 64 conditional-sum aggregates →
    reassemble bits.  Bit b set iff the majority sum is > 0.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    th = toks.select("doc_id", F.xxhash64(F.col("tok")).alias("h"))
    agg = th.groupBy("doc_id").agg(*simhash_col_aggs())
    bit_terms = [
        F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long") * F.lit(2 ** b if b < 63 else -(2 ** 63))).otherwise(0)
        for b in range(64)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return agg.select("doc_id", total.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: split 64 bits into (max_hamming+1) blocks — a
    pair within distance d must agree exactly on ≥1 block; equi-join per
    block, then exact popcount filter.  No cross join at any scale.
    """
    nb = max_hamming + 1
    width = 64 // nb
    sh = simhash(docs, id_col, text_col)
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for i in range(nb)
        ]
    )
    blocked = sh.select("doc_id", "simhash", F.explode(blocks).alias("b")).select(
        "doc_id", "simhash", F.col("b.blk").alias("blk"), F.col("b.bv").alias("bv")
    )
    left = blocked.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "blk", "bv")
    right = blocked.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "blk", "bv")
    cand = left.join(right, ["blk", "bv"]).where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb").distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("a", "b", hamming.alias("hamming")).where(F.col("hamming") <= F.lit(max_hamming))
