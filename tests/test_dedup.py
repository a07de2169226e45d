"""Parity tests for the sketch-based dedup operators.

MinHash/SimHash hash via md5-derived 32-bit integers (bit-identical in
DuckDB — the driver oracle now covers the full pipelines); the tests here
additionally re-compute the sketches in pure python over the hash values
Spark itself produces, isolating the sketch/aggregation logic
(permutations, banding, bit-majority, blocking).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.operators.dedup import (
    _MH_PRIME,
    _perm_params,
    jaccard_pairs,
    md5_h32_col,
    minhash_lsh_pairs,
    minhash_signatures,
    shingles_col,
    simhash,
    simhash_near_pairs,
)
from datacube_core_spark.sources.corpus import dedup_corpus

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def corpus(spark):
    return dedup_corpus(spark, SF_TINY)


def _shingle_sets(spark, corpus, n=3):
    rows = corpus.select(
        "doc_id", shingles_col(F.col("text"), n).alias("sh")
    ).collect()
    return {int(r["doc_id"]): set(r["sh"]) for r in rows}


def test_jaccard_pairs_bruteforce(spark, corpus):
    sets = _shingle_sets(spark, corpus)
    exp = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                exp.add((a, b))
    got = {(int(r["a"]), int(r["b"])) for r in jaccard_pairs(corpus, 3, 0.5).collect()}
    assert got == exp
    assert len(got) > 0  # planted near-dups must surface


def test_jaccard_df_cut(spark, corpus):
    """The df-cut skew guard: (a) a cutoff above the max observed df is a
    no-op (exact results preserved); (b) a stop-shingle shared by many docs
    is excluded from the join, bounding the bucket, while pairs connected
    by rare shingles are still found."""
    from datacube_core_spark.operators.dedup import with_shingles

    # (a) recall preservation: cutoff >= max df → identical output
    max_df_observed = (
        with_shingles(corpus).groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    exact = {(int(r["a"]), int(r["b"]), float(r["jaccard"])) for r in jaccard_pairs(corpus, 3, 0.5).collect()}
    cut = {
        (int(r["a"]), int(r["b"]), float(r["jaccard"]))
        for r in jaccard_pairs(corpus, 3, 0.5, max_df=max_df_observed).collect()
    }
    assert cut == exact and len(exact) > 0

    # (b) stop-shingle: 40 docs all containing the same trigram "x y z"
    # plus per-doc unique filler; 2 docs that are near-identical via rare
    # shingles.  With max_df=3 the hot shingle leaves the join, and the
    # rare-shingle pair survives.
    rows = [(i, f"x y z u{i} v{i} w{i} q{i}") for i in range(40)]
    rows += [(100, "p q r s t u"), (101, "p q r s t v")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(int(r["a"]), int(r["b"])) for r in jaccard_pairs(docs, 3, 0.5, max_df=3).collect()}
    assert (100, 101) in got
    # every stop-shingle-only pair is cut: docs 0..39 share ONLY "x y z"
    assert all(a >= 100 for a, b in got)
    # and the join substrate itself is bounded: no shingle with df > 3 remains
    sh = with_shingles(docs)
    keep = sh.groupBy("shingle").count().where(F.col("count") <= 3)
    assert sh.join(keep.select("shingle"), "shingle").groupBy("shingle").count().agg(
        F.max("count")
    ).collect()[0][0] <= 3


def test_minhash_signature_parity(spark, corpus):
    # recompute signatures in numpy from Spark's own shingle hashes
    sh = corpus.select(
        "doc_id", F.explode(shingles_col(F.col("text"), 3)).alias("shingle")
    ).select("doc_id", md5_h32_col(F.col("shingle")).alias("h"))
    rows = sh.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(int(r["h"]))
    params = _perm_params()
    exp = {}
    for d, hs in by_doc.items():
        h = np.array(hs, dtype=np.uint64)
        sig = [int(((h * pa + pb) % _MH_PRIME).min()) for pa, pb in params]
        exp[d] = sig
    got = {int(r["doc_id"]): [int(v) for v in r["sig"]] for r in minhash_signatures(corpus).collect()}
    assert got == exp


def test_minhash_lsh_finds_planted_dups(spark, corpus):
    got = {(int(r["a"]), int(r["b"])) for r in minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    # exact twins (jaccard 1.0) must ALL be found: identical signatures
    twins = {
        (int(r["doc_id"]), int(r["doc_id"]) + 10_000_000)
        for r in corpus.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 10_000_000)).collect()
    }
    missing = twins - got
    assert not missing, f"missing exact twins: {sorted(missing)[:5]}"
    # verification stage guarantees precision: every reported pair is a
    # true >= 0.5 jaccard pair
    sets = _shingle_sets(spark, corpus)
    for a, b in got:
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        assert inter / (len(sa) + len(sb) - inter) >= 0.5


def test_simhash_parity(spark, corpus):
    toks = corpus.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).select(
        "doc_id",
        md5_h32_col(F.col("tok"), 9).alias("h_lo"),
        md5_h32_col(F.col("tok"), 1).alias("h_hi"),
    )
    by_doc = {}
    for r in toks.collect():
        by_doc.setdefault(int(r["doc_id"]), []).append((int(r["h_hi"]) << 32) | int(r["h_lo"]))
    exp = {}
    for d, hs in by_doc.items():
        h = np.array(hs, dtype=np.uint64)
        val = np.uint64(0)
        for b in range(64):
            votes = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
            if votes.sum() > 0:
                val |= np.uint64(1) << np.uint64(b)
        exp[d] = int(np.int64(val))
    got = {int(r["doc_id"]): int(r["simhash"]) for r in simhash(corpus).collect()}
    assert got == exp


def test_simhash_near_pairs_exact_twins(spark, corpus):
    got = simhash_near_pairs(corpus, max_hamming=3)
    pairs = {(int(r["a"]), int(r["b"])): int(r["hamming"]) for r in got.collect()}
    twins = {
        (int(r["doc_id"]), int(r["doc_id"]) + 10_000_000)
        for r in corpus.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 10_000_000)).collect()
    }
    for t in twins:
        assert pairs.get(t) == 0, f"exact twin {t} not at hamming 0"


def test_dup_clusters_components(spark):
    """Connected components: chain, triangle+appendage, singles pair —
    each node labeled with its component's min id; convergence beats
    diameter via min-label propagation."""
    from datacube_core_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain -> cluster 1
            (10, 11), (11, 12), (10, 12),    # triangle
            (12, 13),                        # appendage -> cluster 10
            (20, 21),                        # pair -> cluster 20
        ],
        "a LONG, b LONG",
    )
    got = {int(r["doc_id"]): int(r["cluster"]) for r in dup_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_dup_clusters_deep_chain_and_nonconvergence(spark):
    """Pointer jumping converges a diameter-64 chain within the default
    iteration budget; forced under-budget raises instead of returning
    silently partial components."""
    from datacube_core_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame([(i, i + 1) for i in range(64)], "a LONG, b LONG")
    out = dup_clusters(chain)
    assert {int(r["cluster"]) for r in out.collect()} == {0}
    with pytest.raises(ValueError, match="did not converge"):
        dup_clusters(chain, max_iters=2)
