"""As-of join: semantics, both physical paths, and DuckDB ASOF parity."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.operators.asof import asof_join


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _ref_asof(lrows, rrows, forward=False, tolerance=None):
    """Brute-force reference: lrows = [(k, ts, lv)], rrows = [(k, ts, pv)]."""
    out = []
    for k, ts, lv in lrows:
        if forward:
            cand = [(rts, pv) for rk, rts, pv in rrows if rk == k and rts >= ts]
            best = min(cand) if cand else None
        else:
            cand = [(rts, pv) for rk, rts, pv in rrows if rk == k and rts <= ts]
            best = max(cand) if cand else None
        if best is not None and tolerance is not None and abs(best[0] - ts) > tolerance:
            best = None
        out.append((k, ts, lv, best[1] if best else None, best[0] if best else None))
    return sorted(out)


def _dfs(spark, lrows, rrows):
    l = spark.createDataFrame([Row(k=k, lts=ts, lv=v) for k, ts, v in lrows])
    r = spark.createDataFrame([Row(k=k, rts=ts, pv=v) for k, ts, v in rrows])
    return l, r


LROWS = [(1, 10, "a"), (1, 5, "b"), (1, 20, "c"), (2, 7, "d"), (3, 1, "e")]
RROWS = [(1, 5, 50), (1, 15, 150), (2, 7, 70), (2, 9, 90), (9, 1, 10)]


def test_backward_semantics(spark):
    l, r = _dfs(spark, LROWS, RROWS)
    got = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"]).select(
            "k", "lts", "lv", "pv", "rts_matched"
        )
    )
    assert got == _ref_asof(LROWS, RROWS)
    # spot semantics: equal ts matches; earlier-than-all gives null
    asdict = {(k, ts): (pv, m) for k, ts, _, pv, m in got}
    assert asdict[(1, 5)] == (50, 5)  # inclusive equal-ts
    assert asdict[(3, 1)] == (None, None)  # key with no right rows
    assert asdict[(1, 20)] == (150, 15)


def test_forward_and_tolerance(spark):
    l, r = _dfs(spark, LROWS, RROWS)
    got = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"], direction="forward").select(
            "k", "lts", "lv", "pv", "rts_matched"
        )
    )
    assert got == _ref_asof(LROWS, RROWS, forward=True)
    got_tol = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"], tolerance=4).select(
            "k", "lts", "lv", "pv", "rts_matched"
        )
    )
    assert got_tol == _ref_asof(LROWS, RROWS, tolerance=4)


def _skewed():
    lrows, rrows = [], []
    for i in range(3000):  # hot key 0
        lrows.append((0, (i * 37) % 5000, f"l{i}"))
        if i % 3 == 0:
            rrows.append((0, (i * 53) % 5000, i))
    for k in range(1, 20):  # cold keys, some right-empty
        lrows.append((k, k * 11, f"c{k}"))
        if k % 4:
            rrows.append((k, k * 7, 1000 + k))
    # de-dup (key, ts) on the right (operator contract)
    seen, rdedup = set(), []
    for k, ts, v in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts, v))
    return lrows, rdedup


@pytest.mark.parametrize("bucket", [64, 777, 10000])
def test_bucketed_path_equivalent(spark, bucket):
    lrows, rrows = _skewed()
    l, r = _dfs(spark, lrows, rrows)
    plain = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"]).select("k", "lts", "pv", "rts_matched")
    )
    bucketed = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"], ts_bucket=bucket).select(
            "k", "lts", "pv", "rts_matched"
        )
    )
    assert bucketed == plain


def test_bucketed_forward_tolerance_equivalent(spark):
    lrows, rrows = _skewed()
    l, r = _dfs(spark, lrows, rrows)
    a = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"], direction="forward",
                  tolerance=200).select("k", "lts", "pv", "rts_matched")
    )
    b = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"], direction="forward",
                  tolerance=200, ts_bucket=300).select("k", "lts", "pv", "rts_matched")
    )
    assert a == b
    assert a == [
        (k, ts, pv, m)
        for k, ts, _, pv, m in _ref_asof(lrows, rrows, forward=True, tolerance=200)
    ]


def test_duckdb_asof_parity(spark):
    lrows, rrows = _skewed()
    l, r = _dfs(spark, lrows, rrows)
    got = _collect(
        asof_join(l, r, ["k"], "lts", "rts", ["pv"]).select("k", "lts", "pv")
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INT, lts INT, lv VARCHAR)")
    con.execute("CREATE TABLE r (k INT, rts INT, pv INT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    duck = sorted(
        tuple(x)
        for x in con.execute(
            "SELECT l.k, l.lts, r.pv FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )
    assert got == duck


@pytest.mark.parametrize("bucket", [None, 7])
def test_null_payload_atomic(spark, bucket):
    # the NEWEST match carries a NULL payload; a per-column scan would
    # splice in 50 from the older row — the match must stay atomic
    lrows = [(1, 20, "a"), (1, 6, "b"), (1, 3, "c")]
    rrows = [(1, 5, 50), (1, 15, None)]
    l = spark.createDataFrame(
        [Row(k=k, lts=ts, lv=v) for k, ts, v in lrows]
    )
    r = spark.createDataFrame(
        [Row(k=k, rts=ts, pv=v) for k, ts, v in rrows],
        schema="k int, rts int, pv int",
    )
    got = {
        (row.k, row.lts): (row.pv, row.rts_matched)
        for row in asof_join(
            l, r, ["k"], "lts", "rts", ["pv"], ts_bucket=bucket
        ).collect()
    }
    assert got[(1, 20)] == (None, 15)  # matched row's NULL preserved
    assert got[(1, 6)] == (50, 5)
    assert got[(1, 3)] == (None, None)  # no match at all


def test_reserved_column_names(spark):
    l, r = _dfs(spark, LROWS, RROWS)
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l, r.withColumnRenamed("pv", "__t"), ["k"], "lts", "rts", ["__t"])
    with pytest.raises(ValueError, match="reserved"):
        # internal bucket column on the LEFT would be silently overwritten
        asof_join(l.withColumnRenamed("lv", "__b"), r, ["k"], "lts", "rts", ["pv"])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l.withColumnRenamed("lv", "__p_pv"), r, ["k"], "lts", "rts", ["pv"])


def test_plain_path_has_no_join_node(spark):
    l, r = _dfs(spark, LROWS, RROWS)
    plan = (
        asof_join(l, r, ["k"], "lts", "rts", ["pv"])
        ._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoop"):
        assert bad not in plan
