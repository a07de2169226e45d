"""Token-budget corpus sampling — a first-class training-data op
(task-brief §2.12 class: "token budgeting"): pick, per group (language /
source / domain), the best documents whose token counts fit a budget,
deterministically.

Two plans for the same semantics:

* :func:`token_budget_sample` — EXACT: per-group running token sum over
  the priority order (``Window.partitionBy(group).orderBy(priority)``),
  keep rows while the cumulative sum stays within budget.  One shuffle on
  the group key; the hot group serializes through a single window
  partition — correct at any size but the 100-TB wall-clock is bounded
  by the largest group.  This is the oracle-twinned form (SQL window in
  DuckDB, entry ``token_budget``).

* :func:`token_budget_sample_threshold` — SCALE PATH: the prefix-sum is
  really a THRESHOLD search ("the worst priority we still admit"), so it
  two-passes: (1) per-(group, priority-range-bucket) token sums — a plain
  hash aggregation, fully parallel; (2) a DISTRIBUTED boundary decision:
  an exclusive running sum over the ≤ n_buckets rows per group picks each
  group's boundary bucket and the budget consumed entering it, and the
  |groups|-row decision table joins back on the group key (never
  collected — per-domain budgets with millions of groups stay
  executor-side; AQE broadcasts the table when it happens to be small);
  (3) rows in strictly-better buckets are kept by the join ALONE (no
  window), and only the boundary bucket — ~1/n_buckets of each group —
  pays an exact within-bucket window.  Identical keep-set to the exact
  plan for any priority with deterministic total order (ties must be
  broken inside ``priority``, e.g. by doc id — both plans assume it).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(priority: Sequence[Tuple[str, str]]) -> List[Column]:
    out = []
    for name, direction in priority:
        c = F.col(name)
        # nulls LAST in BOTH directions (Spark's bare .asc() is nulls
        # FIRST) — NULL priority must always be "worst", matching the
        # threshold plan's routing of NULLs to the worst bucket
        out.append(
            c.desc_nulls_last() if direction.lower() == "desc" else c.asc_nulls_last()
        )
    return out


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str = "tokens",
    group_cols: Sequence[str] = ("lang",),
    priority: Sequence[Tuple[str, str]] = (("tokens", "desc"), ("doc_id", "asc")),
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Exact per-group budget sample: rows in priority order while the
    running token total ≤ ``budget`` (a row that would cross the budget
    is excluded, as are all rows after it).  Output = input columns +
    ``cum_col`` (the running total INCLUDING the row)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*_order_cols(priority))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(cum_col, F.sum(F.col(token_col)).over(w))
        .where(F.col(cum_col) <= F.lit(int(budget)))
    )


def token_budget_sample_threshold(
    df: DataFrame,
    budget: int,
    token_col: str = "tokens",
    group_cols: Sequence[str] = ("lang",),
    priority_col: str = "tokens",
    priority_desc: bool = True,
    tie_col: str = "doc_id",
    n_buckets: int = 64,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Threshold-search form of :func:`token_budget_sample` for a SINGLE
    numeric priority column (+ tie column): same keep-set, no full-group
    window.  See module docstring for the plan shape.

    The within-bucket exact pass still emits ``cum_col`` offset by the
    tokens consumed in better buckets, so output rows carry the same
    running totals as the exact plan."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")

    # pass 0: per-group priority range (one hash agg)
    rng = df.groupBy(*group_cols).agg(
        F.min(priority_col).alias("_pmin"), F.max(priority_col).alias("_pmax")
    )
    withb = df.join(F.broadcast(rng), on=list(group_cols), how="inner")
    span = F.col("_pmax") - F.col("_pmin")
    frac = F.when(span > 0, (F.col(priority_col) - F.col("_pmin")) / span).otherwise(F.lit(0.0))
    # bucket 0 = BEST priority
    pos = F.floor(frac * n_buckets).cast("int")
    pos = F.least(pos, F.lit(n_buckets - 1))
    bucket = (F.lit(n_buckets - 1) - pos) if priority_desc else pos
    # NULL priority sorts LAST in both plans (the window order uses
    # explicit *_nulls_last) → worst bucket here; its tokens contribute
    # what F.sum contributes (nulls skipped), matching the exact plan
    bucket = F.when(F.col(priority_col).isNull(), F.lit(n_buckets - 1)).otherwise(bucket)
    withb = withb.withColumn("_bkt", bucket).drop("_pmin", "_pmax")

    # pass 1: token mass per (group, bucket), then the boundary decision —
    # fully DISTRIBUTED (VERDICT r5 item 4: the old driver-side collect of
    # the (group × bucket) grid made the decision table data-sized for
    # high-cardinality groups, e.g. per-domain budgets at web scale).
    # The grid is ≤ n_buckets rows per group, so the ordered window below
    # is a bounded per-group scan; the decision table is |groups| rows and
    # joins back on the group key (AQE turns it into a broadcast join when
    # it is small, keeps a shuffle join when it is not).
    # (coalesce: a bucket holding only NULL-token rows has NULL sum)
    grid = withb.groupBy(*group_cols, "_bkt").agg(
        F.coalesce(F.sum(token_col), F.lit(0)).alias("_mass")
    )
    # tokens consumed ENTERING each bucket = exclusive running sum
    wcons = (
        Window.partitionBy(*group_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn("_consumed", F.coalesce(F.sum("_mass").over(wcons), F.lit(0)))
    # boundary = FIRST bucket whose mass crosses the remaining budget
    crossing = grid.where(F.col("_consumed") + F.col("_mass") > F.lit(int(budget)))
    bnd = crossing.groupBy(*group_cols).agg(
        F.min("_bkt").alias("_xb"),
        F.min_by("_consumed", "_bkt").alias("_xo"),
    )
    # everything-fits groups: boundary past the last bucket, offset = total
    tot = grid.groupBy(*group_cols).agg(
        (F.max("_bkt") + F.lit(1)).alias("_ab"), F.sum("_mass").alias("_at")
    )
    bdf = tot.join(bnd, on=list(group_cols), how="left").select(
        *group_cols,
        F.coalesce(F.col("_xb"), F.col("_ab")).cast("int").alias("_boundary"),
        F.coalesce(F.col("_xo"), F.col("_at")).cast("long").alias("_offset"),
    )

    routed = withb.join(bdf, on=list(group_cols), how="inner")

    # strictly-better buckets: kept by the join alone; cum_col needs the
    # within-kept running sum — that part is still a window, but ONLY over
    # the kept prefix (≤ budget tokens per group by construction)
    kept_prefix = routed.where(F.col("_bkt") < F.col("_boundary"))
    order = [
        F.col(priority_col).desc_nulls_last()
        if priority_desc
        else F.col(priority_col).asc_nulls_last(),
        F.col(tie_col).asc_nulls_last(),
    ]
    wp = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_prefix = (
        kept_prefix.withColumn(cum_col, F.sum(F.col(token_col)).over(wp))
        # non-NULL cums here are ≤ budget by the boundary construction, so
        # this predicate only drops rows whose running sum is NULL (an
        # all-NULL-token prefix — possible when priority_col != token_col,
        # or a group whose every token is NULL) — which the exact plan's
        # WHERE cum <= budget also drops.  Without it the two plans'
        # keep-sets diverge on NULL tokens.
        .where(F.col(cum_col) <= F.lit(int(budget)))
    )

    # boundary bucket: exact pass over ~1/n_buckets of the group
    edge = routed.where(F.col("_bkt") == F.col("_boundary"))
    we = (
        Window.partitionBy(*group_cols, "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge = (
        edge.withColumn(cum_col, F.sum(F.col(token_col)).over(we) + F.col("_offset"))
        .where(F.col(cum_col) <= F.lit(int(budget)))
    )

    drop = ["_bkt", "_boundary", "_offset"]
    return kept_prefix.drop(*drop).unionByName(edge.drop(*drop))


def hash_stratified_sample(
    df: DataFrame,
    rates: dict,
    key_col: str = "doc_id",
    group_col: str = "lang",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group rate sampling (mixture weighting): keep a
    row iff ``hash(key) mod 1e6 < rate(group) * 1e6`` — a pure function
    of the key, so the sample is reproducible across runs/engines and
    stable under repartitioning (unlike ``df.sample``, whose output
    depends on partition layout).  The hash is a Knuth multiplicative
    mix, kept inside int64 by reducing the key first; the arithmetic is
    plain SQL, so an external oracle can reproduce the exact sample.

    ``rates``: {group value: keep fraction in [0, 1]}; groups not listed
    use ``default_rate``."""
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    h = ((F.col(key_col) % F.lit(1_000_003)) * F.lit(2_654_435_761)) % F.lit(4_294_967_296)
    bucket = h % F.lit(1_000_000)
    # thresholds are INTEGER literals computed once on the driver: a
    # float-expression threshold diverges between engines (double
    # 0.3*1e6 truncates to 299999 in Spark while DECIMAL arithmetic
    # rounds to 300000 in DuckDB) — round-half-up in exactly one place
    # and ship the int to both
    thresholds = {g: int(round(r * 1_000_000)) for g, r in rates.items()}
    default_t = int(round(float(default_rate) * 1_000_000))
    thr = None
    for g, t in sorted(thresholds.items()):
        cond = F.col(group_col) == F.lit(g)
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    thr = F.lit(default_t) if thr is None else thr.otherwise(F.lit(default_t))
    return df.where(bucket < thr)


def sql_hash_stratified_pred(rates: dict, key_col: str = "doc_id",
                             group_col: str = "lang", default_rate: float = 0.0) -> str:
    """DuckDB twin of :func:`hash_stratified_sample`'s predicate — the
    same pre-rounded INTEGER thresholds (see the comment there)."""
    def _q(v) -> str:
        return "'" + str(v).replace("'", "''") + "'"  # SQL-standard quote doubling

    cases = " ".join(
        f"WHEN {group_col} = {_q(g)} THEN {int(round(r * 1_000_000))}"
        for g, r in sorted(rates.items())
    )
    thr = f"(CASE {cases} ELSE {int(round(float(default_rate) * 1_000_000))} END)"
    h = f"((({key_col} % 1000003) * 2654435761) % 4294967296)"
    return f"({h} % 1000000) < {thr}"


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 64,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle — the dataloader-facing corpus op:
    every epoch draws a DIFFERENT pseudorandom permutation of the corpus,
    yet the permutation is a pure function of (epoch, key), so any
    engine, any partition layout, any retry reproduces it exactly
    (unlike ``df.orderBy(rand())``, whose seed is per-partition-layout).

    Shape: a multiply-shift tabulation mix of (key, epoch) — 16-bit key
    chunks times per-chunk odd constants, mod 2³², the same
    integer-arithmetic discipline as :func:`hash_stratified_sample`,
    exact in int64 and SQL-expressible — gives each row a shuffle key;
    rows land
    in ``shard = mix % n_shards`` and take their epoch position from the
    (mix, key) order within the shard.  At 100 TB each shard is one
    output file written by one task in one pass: the per-shard window is
    the file writer's sort, parallel across shards, and no global
    total-order sort ever runs.  Output = input columns + ``epoch``,
    ``shard``, ``pos`` (0-based position within the shard)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    k = F.col(key_col).cast("long")
    # multiply-shift TABULATION mix: the key is split into 16-bit chunks,
    # each chunk multiplied by its own odd 32-bit constant, summed with a
    # mixed epoch term, all mod 2^32.  Every intermediate stays under
    # 2^48 (chunk < 2^16 times constant < 2^32), so the arithmetic is
    # exact in int64 and a SQL oracle reproduces it verbatim — the reason
    # NOT to use xxhash64/rand(): no cross-engine twin.
    c0, c1, c2, ce = 2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263
    M32 = 4_294_967_296
    t0 = ((k % 65_536) * F.lit(c0)) % F.lit(M32)
    t1 = ((F.shiftright(k, 16) % 65_536) * F.lit(c1)) % F.lit(M32)
    t2 = ((F.shiftright(k, 32) % 65_536) * F.lit(c2)) % F.lit(M32)
    te = F.lit((int(epoch) * ce) % M32)
    mixed = (t0 + t1 + t2 + te) % F.lit(M32)
    out = df.withColumn("_mix", mixed)
    w = Window.partitionBy(F.col("_mix") % F.lit(int(n_shards))).orderBy(
        F.col("_mix").asc(), F.col(key_col).asc()
    )
    return (
        out.withColumn("epoch", F.lit(int(epoch)).cast("int"))
        .withColumn("shard", (F.col("_mix") % F.lit(int(n_shards))).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_mix")
    )


def sql_epoch_shuffle(epoch: int, n_shards: int = 64, key_col: str = "doc_id") -> str:
    """DuckDB twin of the :func:`epoch_shuffle` key/shard/pos arithmetic
    (SELECT fragment over a relation exposing ``key_col``): returns the
    expressions for ``epoch``, ``shard``, ``pos``."""
    c0, c1, c2, ce = 2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263
    M32 = 4_294_967_296
    mix = (
        f"((({key_col} % 65536) * {c0}) % {M32}"
        f" + ((({key_col} // 65536) % 65536) * {c1}) % {M32}"
        f" + ((({key_col} // {M32}) % 65536) * {c2}) % {M32}"
        f" + {(int(epoch) * ce) % M32}) % {M32}"
    )
    return (
        f"CAST({int(epoch)} AS INT) AS epoch, "
        f"CAST(({mix}) % {int(n_shards)} AS INT) AS shard, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY ({mix}) % {int(n_shards)} "
        f"ORDER BY {mix} ASC, {key_col} ASC) - 1 AS BIGINT) AS pos"
    )


def pack_sequences(
    df: DataFrame,
    window_tokens: int,
    token_col: str = "tokens",
    shard_col: str = "shard",
    pos_col: str = "pos",
    key_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing — the LLM-pretraining batch layout: documents are
    concatenated in shard order and split into fixed ``window_tokens``
    context windows ("chunked concatenation": no padding waste, documents
    may span a window boundary).  Input rows carry a shard and a dense
    in-shard position (:func:`epoch_shuffle` output composes directly);
    output adds

    * ``start_off`` — token offset of the document within its shard's
      concatenated stream,
    * ``first_win`` / ``last_win`` — the window ids the document touches
      (``last_win > first_win`` iff it crosses a boundary).

    One running sum per shard (the same parallel per-shard windows as the
    shuffle itself — no global coordination), pure integer arithmetic,
    so a SQL oracle replays it exactly.  A dataloader seeking window W of
    shard S reads the rows with ``first_win <= W <= last_win`` — the
    index this op exists to produce."""
    if window_tokens < 1:
        raise ValueError("window_tokens must be >= 1")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(pos_col).asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(token_col).cast("long")
    end_off = F.sum(t).over(w)  # exclusive end of this doc's span
    out = df.withColumn("start_off", end_off - t)
    # `div`, not `/`: float division truncate-cast can miss the true
    # floor on large offsets; integer div is exact at any magnitude and
    # matches DuckDB's `//`
    wt = int(window_tokens)
    return (
        out.withColumn("first_win", F.expr(f"start_off div {wt}"))
        .withColumn(
            "last_win",
            F.expr(f"greatest(start_off, start_off + CAST({token_col} AS BIGINT) - 1) div {wt}"),
        )
    )


def sql_pack_sequences(
    window_tokens: int,
    token_col: str = "tokens",
    shard_col: str = "shard",
    pos_col: str = "pos",
    key_col: str = "doc_id",
) -> str:
    """DuckDB twin expressions for :func:`pack_sequences` (SELECT
    fragment over a relation carrying shard/pos/tokens)."""
    end = (
        f"SUM(CAST({token_col} AS BIGINT)) OVER (PARTITION BY {shard_col} "
        f"ORDER BY {pos_col} ASC, {key_col} ASC ROWS UNBOUNDED PRECEDING)"
    )
    start = f"({end} - {token_col})"
    return (
        f"CAST({start} AS BIGINT) AS start_off, "
        f"CAST({start} // {window_tokens} AS BIGINT) AS first_win, "
        f"CAST(GREATEST({start}, {start} + {token_col} - 1) // {window_tokens} AS BIGINT) AS last_win"
    )
