"""Grouped quantiles (operators/quantile.py): exact rank path vs
histogram path vs an independent numpy reference + DuckDB twins."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from datacube_core_spark.operators.quantile import (
    group_quantiles_exact,
    group_quantiles_hist,
    sql_group_quantiles_exact,
    sql_group_quantiles_hist,
)

QS = ((25, 100), (50, 100), (90, 100), (99, 100))


def _type1(vals, n_, d_):
    """Independent type-1 quantile: value at rank ceil(q*n), 1-based."""
    s = sorted(vals)
    r = -(-n_ * len(s) // d_)  # ceil without floats
    return s[r - 1]


def _mkrows(seed=7, n=400):
    rng = np.random.RandomState(seed)
    rows = []
    for g, lam in (("a", 40), ("b", 300), ("c", 3)):
        for v in rng.poisson(lam, n):
            rows.append((g, int(v)))
    rows.append(("d", 5))  # single-element group: every q -> 5
    return rows


def test_exact_matches_numpy_reference(spark):
    rows = _mkrows()
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    got = {
        (r["g"], r["q_num"]): r["val"]
        for r in group_quantiles_exact(df, ("g",), "v", QS).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for (g, qn), val in got.items():
        assert val == _type1(by_g[g], qn, 100), (g, qn)
    assert got[("d", 25)] == got[("d", 99)] == 5


def test_hist_width1_equals_exact_and_duckdb(spark):
    rows = _mkrows(seed=11)
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    ex = {
        (r["g"], r["q_num"]): r["val"]
        for r in group_quantiles_exact(df, ("g",), "v", QS).collect()
    }
    hi = {
        (r["g"], r["q_num"]): r["val"]
        for r in group_quantiles_hist(df, ("g",), "v", QS).collect()
    }
    assert ex == hi
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dex = {
        (r[0], r[1]): r[3]
        for r in con.execute(sql_group_quantiles_exact("t", ("g",), "v", QS)).fetchall()
    }
    dhi = {
        (r[0], r[1]): r[3]
        for r in con.execute(sql_group_quantiles_hist("t", ("g",), "v", QS)).fetchall()
    }
    assert dex == ex and dhi == hi


def test_hist_wide_bins_bound_the_exact_value(spark):
    """bin_width w returns the bin LOWER bound: val_hist <= exact <
    val_hist + w, and exactly one row per (group, q)."""
    rows = _mkrows(seed=23)
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    ex = {
        (r["g"], r["q_num"]): r["val"]
        for r in group_quantiles_exact(df, ("g",), "v", QS).collect()
    }
    w = 8
    hist = group_quantiles_hist(df, ("g",), "v", QS, bin_width=w).collect()
    assert len(hist) == len(ex)
    for r in hist:
        e = ex[(r["g"], r["q_num"])]
        assert r["val"] <= e < r["val"] + w, (r, e)


def test_hist_plan_is_partial_agg_no_join(spark):
    """The histogram path must stay cartesian/Python-free and contain a
    hash aggregate (the map-side-combinable count), not a data join."""
    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 97).alias("v"),
    )
    plan = (
        group_quantiles_hist(df, ("g",), "v", QS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    head = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in head and "BroadcastNestedLoopJoin" not in head
    assert "Python" not in head
    assert "HashAggregate" in head


def test_nulls_are_ignored_both_paths_and_engines(spark):
    """Review finding: NULL values must be excluded (SQL percentile
    semantics) — and they were a cross-engine trap (Spark asc() is NULLS
    FIRST, DuckDB defaults NULLS LAST)."""
    rows = [("a", v) for v in (1, 2, 3, 4, None, None)]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    ex = {
        r["q_num"]: r["val"]
        for r in group_quantiles_exact(df, ("g",), "v", QS).collect()
    }
    hi = {
        r["q_num"]: r["val"]
        for r in group_quantiles_hist(df, ("g",), "v", QS).collect()
    }
    # n = 4 (NULLs ignored): p25 -> rank 1 -> 1; p99 -> rank 4 -> 4
    assert ex == {25: 1, 50: 2, 90: 4, 99: 4} == hi
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dex = {
        r[1]: r[3]
        for r in con.execute(sql_group_quantiles_exact("t", ("g",), "v", QS)).fetchall()
    }
    assert dex == ex
