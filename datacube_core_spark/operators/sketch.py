"""Portable HyperLogLog distinct-count sketch (grouped approx-distinct).

``COUNT(DISTINCT x)`` is the classic web-scale pain: exact distinct
needs a full shuffle of every distinct value per group, and a hot group
(one host with 10^9 urls) concentrates on one reducer.  The HLL sketch
replaces that with a CONSTANT per-group state (m = 2^p registers), all
partial-agg (map-side combine), hot groups cost the same as cold ones.

This module shares the HyperBall machinery (``operators/graph.py``):
bucket j = md5-h32(value) mod m, rank = leading-zero count of a second
md5-h32 window (generated comparison chain, no log2), registers kept
sparse-exploded as (group, j, r) rows, ball/cardinality size carried as
the EXACT integer S = Σ_j 2^(R − reg_j) and the float estimate as a
fixed left-associated tree over it — so the DuckDB twin agrees BITWISE
despite this being an approximation (an estimator is still a
deterministic function of its input).

Like Spark's own ``approx_count_distinct`` (also HLL) this trades ~1.04/√m
relative error for constant memory; unlike it, the register state here
is portable and replayable in plain SQL — the cross-engine contract the
repo's oracle gate needs.  Raw Flajolet estimator, no small/large-range
corrections (documented in graph.py: corrections are display-time; the
contract is the exact register state).

Scale shape: ONE shuffle groupBy(group, j).max — partial agg, m ≤ 2^p
rows per group regardless of data — then a second m-row-per-group agg.
Reference analog: none in ODC (Postgres COUNT(DISTINCT) at index scale);
webtext extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import HLL_W, _hll_alpha, _hll_rank_col, _sql_hll_rank


def hll_registers(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value: Column,
    p: int = 4,
) -> DataFrame:
    """Sparse register state (group_cols..., j, r): the incrementally
    maintainable half of the sketch — ONE groupBy(group, j).max(r), a
    partial-agg shuffle in batch and a supported stateful aggregate in
    Structured Streaming (update mode), so the same definition serves
    both (``streaming/jobs.streaming_hll_registers``).  NULL values are
    ignored (SQL COUNT(DISTINCT) semantics)."""
    from .dedup import md5_h32_col

    m = 1 << p
    gc = list(group_cols)
    v = value.cast("string")
    staged = df.where(v.isNotNull()).select(
        *gc,
        (md5_h32_col(v, start=1) % m).alias("j"),
        md5_h32_col(v, start=9).alias("hbits"),
    )
    return (
        staged.select(*gc, "j", _hll_rank_col(F.col("hbits")).alias("r"))
        .groupBy(*gc, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: tuple[str, ...],
    p: int = 4,
) -> DataFrame:
    """Fold a register table into (group_cols..., s, est) — estimate-on-
    read over a (tiny, ≤ m rows per group) register state, batch-only."""
    m = 1 << p
    r_max = HLL_W + 1
    two_r = 1 << r_max
    gc = list(group_cols)
    alpha = _hll_alpha(m)
    s = regs.groupBy(*gc).agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - r)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(two_r).cast("long")
        ).cast("long").alias("s")
    )
    est = (
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(two_r))
        / F.col("s").cast("double")
    )
    return s.select(*gc, "s", est.alias("est"))


def hll_count_distinct(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value: Column,
    p: int = 4,
) -> DataFrame:
    """Per-group approximate distinct count of ``value``.

    Returns (group_cols..., s, est): ``s`` the exact int64 register sum
    S = Σ 2^(R − reg) (absent buckets add 2^R), ``est`` the float HLL
    estimate alpha_m·m²·2^R / S.  Composition of :func:`hll_registers`
    and :func:`hll_estimate`."""
    return hll_estimate(hll_registers(df, group_cols, value, p), group_cols, p)


def sql_hll_count_distinct(
    rows_cte: str,
    group_cols: tuple[str, ...],
    value_expr: str,
    p: int = 4,
) -> str:
    """DuckDB twin: same hash → rank → max-register → exact S → float
    tree.  ``rows_cte`` must expose ``group_cols`` and the value
    expression's inputs.  Returns a complete SELECT (subquery-safe)."""
    from .dedup import sql_md5_h32

    m = 1 << p
    r_max = HLL_W + 1
    two_r = 1 << r_max
    alpha = _hll_alpha(m)
    gc = ", ".join(group_cols)
    vs = f"CAST({value_expr} AS VARCHAR)"
    est = (
        f"((({alpha!r} * {float(m * m)!r}) * {float(two_r)!r})"
        f" / CAST(s AS DOUBLE))"
    )
    return f"""SELECT {gc}, s, {est} AS est FROM (
  SELECT {gc},
         CAST(SUM(CAST(1 AS BIGINT) << ({r_max} - r))
              + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {r_max})
         AS BIGINT) AS s
  FROM (
    SELECT {gc}, j, MAX(r) AS r FROM (
      SELECT {gc}, j, {_sql_hll_rank('hbits')} AS r FROM (
        SELECT {gc},
               {sql_md5_h32(vs, start=1)} % {m} AS j,
               {sql_md5_h32(vs, start=9)} AS hbits
        FROM {rows_cte}
        WHERE {value_expr} IS NOT NULL
      )
    ) GROUP BY {gc}, j
  ) GROUP BY {gc}
)"""


# ---------------------------------------------------------------------------
# Count-min sketch: fixed-size frequency table (Cormode & Muthukrishnan
# 2005) — the heavy-hitter companion to the HLL distinct sketch above.
# Term/url/host frequency at corpus scale with a (d × w) integer matrix
# instead of a count-per-key table: state is d·w cells REGARDLESS of
# cardinality, the build is one partial-agg shuffle, and the classic
# guarantee holds exactly: estimate ≥ true count always (collisions only
# ADD), est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
#
# Portability: the d row-hashes are the four disjoint 8-hex-digit windows
# of ONE md5 (starts 1/9/17/25 — independent by construction, and exactly
# reproducible in DuckDB like every md5-derived hash in this repo), so
# the whole sketch — matrix and estimates — is integer-exact cross-engine.
# ---------------------------------------------------------------------------

#: md5-hex windows backing the d ≤ 4 CMS rows
CMS_STARTS = (1, 9, 17, 25)


def cms_table(
    df: DataFrame,
    value: Column,
    w: int = 256,
    d: int = 4,
) -> DataFrame:
    """Build the sketch: (i, b, c) rows — row i of the matrix, bucket b,
    count c.  ≤ d·w rows total; one groupBy with map-side combine.
    NULL values are ignored."""
    from .dedup import md5_h32_col

    if not 1 <= d <= len(CMS_STARTS):
        raise ValueError(f"d must be in [1, {len(CMS_STARTS)}]")
    v = value.cast("string")
    staged = df.where(v.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_h32_col(v, start=CMS_STARTS[i]) % w).alias("b"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("ib")
    )
    return (
        staged.select("ib.i", "ib.b")
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    w: int = 256,
    d: int = 4,
) -> DataFrame:
    """Point estimates for probe values: est = min over the d rows of
    the matrix cell the value hashes to.  Returns (value_col, est).
    The sketch side is ≤ d·w rows — broadcast it; probes can be any
    size.  A bucket never touched counts 0 (join miss → coalesce).
    NULL probes are dropped (same policy as the build side and the SQL
    twin's IS NOT NULL filter)."""
    from .dedup import md5_h32_col

    v = F.col(value_col).cast("string")
    keyed = probes.where(v.isNotNull()).select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_h32_col(v, start=CMS_STARTS[i]) % w).alias("b"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("ib"),
    ).select(value_col, "ib.i", "ib.b")
    joined = keyed.join(F.broadcast(cms), ["i", "b"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est")
    )


def _sql_cms_keyed(src: str, value_expr: str, w: int, d: int) -> str:
    """(value, i, b) rows for each of the d hash rows (UNION ALL — the
    SQL analog of the literal-array explode)."""
    from .dedup import sql_md5_h32

    vs = f"CAST({value_expr} AS VARCHAR)"
    parts = [
        f"SELECT {value_expr} AS v, {i} AS i, "
        f"{sql_md5_h32(vs, start=CMS_STARTS[i])} % {w} AS b FROM {src} "
        f"WHERE {value_expr} IS NOT NULL"
        for i in range(d)
    ]
    return " UNION ALL ".join(parts)


def sql_cms_table(src: str, value_expr: str, w: int = 256, d: int = 4) -> str:
    return (
        f"SELECT i, b, COUNT(*) AS c FROM ({_sql_cms_keyed(src, value_expr, w, d)}) "
        f"GROUP BY i, b"
    )


def sql_cms_lookup(
    cms_cte: str, probes_cte: str, value_expr: str, w: int = 256, d: int = 4
) -> str:
    return f"""SELECT v AS {value_expr}, CAST(MIN(COALESCE(m.c, 0)) AS BIGINT) AS est
FROM ({_sql_cms_keyed(probes_cte, value_expr, w, d)}) k
LEFT JOIN {cms_cte} m ON m.i = k.i AND m.b = k.b
GROUP BY v"""


# ---------------------------------------------------------------------------
# Bloom filter: fixed-size MEMBERSHIP sketch (Bloom 1970) — completing
# the family: HLL = distinct, CMS = frequency, histogram = quantile,
# Bloom = membership.  The 100-TB use is blocklist semi-joins
# (benchmark decontamination, kill-lists, seen-URL checks): instead of
# shuffling the corpus against the blocklist, build n_bits of filter
# from the blocklist ONCE, broadcast the ≤ n_bits/32 words, and test
# membership with a map-side expression.  One-sided like CMS: NO false
# negatives ever (a true member always matches), tunable false-positive
# rate ≈ (1 − e^{−kn/m})^k.
#
# Representation: 32-bit words as (word, mask) rows — masks stay in
# [0, 2³²) so int64 bit ops never touch the sign bit in either engine.
# Positions come from the same md5-hex windows as CMS (k ≤ 4);
# aggregation is bit_or — associative/commutative, map-side combinable.
# ---------------------------------------------------------------------------

BLOOM_WORD_BITS = 32


def bloom_build(
    df: DataFrame,
    value: Column,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build the filter from a values DataFrame: (word, mask) rows,
    ≤ n_bits/32 of them.  NULLs ignored."""
    from .dedup import md5_h32_col

    if not 1 <= k <= len(CMS_STARTS):
        raise ValueError(f"k must be in [1, {len(CMS_STARTS)}]")
    v = value.cast("string")
    pos = [
        (md5_h32_col(v, start=CMS_STARTS[i]) % n_bits).alias(f"p{i}")
        for i in range(k)
    ]
    staged = df.where(v.isNotNull()).select(*pos)
    exploded = staged.select(
        F.explode(
            F.array(*[F.col(f"p{i}") for i in range(k)])
        ).alias("p")
    )
    return (
        exploded.select(
            (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """(probe columns..., in_bloom): True iff every one of the k bits is
    set — no false negatives, tunable false positives.

    TRULY map-side: the filter is ≤ n_bits/32 words, so it is collected
    driver-side (a bounded driver decision, like the salt histograms in
    ``operators/skew``) and inlined as an array literal; each probe row
    evaluates k element_at + bit-test expressions — no explode, no join,
    NO SHUFFLE of the probe side at all (the review of the first
    join+groupBy version found its fold was an exchange of ~|probes|
    rows, contradicting the scale claim).  NULL probe values are dropped
    (same policy as the build side, :func:`cms_lookup`, and the SQL
    twin).  Probe columns are passed through untouched; the staging
    columns are double-underscore-reserved."""
    from .dedup import md5_h32_col

    n_words = n_bits // BLOOM_WORD_BITS
    words = {int(r["word"]): int(r["mask"]) for r in bloom.collect()}
    arr = F.array(
        *[F.lit(words.get(w, 0)).cast("long") for w in range(n_words)]
    )
    v = F.col(value_col).cast("string")
    staged = probes.where(v.isNotNull()).select(
        *probes.columns,
        *[
            (md5_h32_col(v, start=CMS_STARTS[i]) % n_bits).alias(f"__bp{i}")
            for i in range(k)
        ],
    )
    hits = []
    for i in range(k):
        need = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % {BLOOM_WORD_BITS} AS INT))"
        )
        word = F.element_at(arr, (F.col(f"__bp{i}") / BLOOM_WORD_BITS).cast("int") + 1)
        hits.append(word.bitwiseAND(need) == need)
    in_bloom = hits[0]
    for h in hits[1:]:
        in_bloom = in_bloom & h
    return staged.select(*probes.columns, in_bloom.alias("in_bloom"))


def sql_bloom_build(src: str, value_expr: str, n_bits: int = 4096, k: int = 3) -> str:
    from .dedup import sql_md5_h32

    vs = f"CAST({value_expr} AS VARCHAR)"
    parts = [
        f"SELECT {sql_md5_h32(vs, start=CMS_STARTS[i])} % {n_bits} AS p "
        f"FROM {src} WHERE {value_expr} IS NOT NULL"
        for i in range(k)
    ]
    un = " UNION ALL ".join(parts)
    return f"""SELECT p // {BLOOM_WORD_BITS} AS word,
       bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD_BITS} AS INT)) AS mask
FROM ({un}) GROUP BY word"""


def sql_bloom_might_contain(
    bloom_cte: str,
    probes_cte: str,
    key_cols: tuple[str, ...],
    value_expr: str,
    n_bits: int = 4096,
    k: int = 3,
) -> str:
    from .dedup import sql_md5_h32

    gc = ", ".join(key_cols)
    vs = f"CAST({value_expr} AS VARCHAR)"
    parts = [
        f"SELECT {gc}, {sql_md5_h32(vs, start=CMS_STARTS[i])} % {n_bits} AS p "
        f"FROM {probes_cte} WHERE {value_expr} IS NOT NULL"
        for i in range(k)
    ]
    un = " UNION ALL ".join(parts)
    return f"""SELECT {gc}, MIN(CASE WHEN (COALESCE(b.mask, 0)
            & (CAST(1 AS BIGINT) << CAST(kk.p % {BLOOM_WORD_BITS} AS INT)))
            = (CAST(1 AS BIGINT) << CAST(kk.p % {BLOOM_WORD_BITS} AS INT))
       THEN 1 ELSE 0 END) = 1 AS in_bloom
FROM ({un}) kk
LEFT JOIN {bloom_cte} b ON b.word = kk.p // {BLOOM_WORD_BITS}
GROUP BY {gc}"""
