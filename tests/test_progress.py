"""progress_cbk + TerminateCurrentLoad (reference api/core.py:28-34)."""

import time

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.operators.progress import TerminateCurrentLoad, run_with_progress


def _slow_df(spark, n_parts=8, sleep=0.4):
    df = spark.range(n_parts).repartition(n_parts)

    @F.udf("long")
    def slow(x):
        time.sleep(sleep)
        return x

    return df.select(slow(F.col("id")).alias("v"))


def test_progress_callbacks_fire(spark):
    calls = []
    out = run_with_progress(
        spark,
        lambda: _slow_df(spark).collect(),
        progress_cbk=lambda d, t: calls.append((d, t)),
        poll_interval=0.1,
    )
    assert len(out) == 8
    assert calls, "no progress callbacks fired"
    done, total = calls[-1]
    assert done == total and total >= 8
    # monotone non-decreasing done counts
    assert all(a[0] <= b[0] for a, b in zip(calls, calls[1:]))


def test_terminate_current_load_cancels(spark):
    calls = []

    def cbk(done, total):
        calls.append((done, total))
        if done >= 1:
            raise TerminateCurrentLoad()

    t0 = time.perf_counter()
    with pytest.raises(TerminateCurrentLoad):
        run_with_progress(
            spark,
            lambda: _slow_df(spark, n_parts=16, sleep=1.5).collect(),
            progress_cbk=cbk,
            poll_interval=0.1,
        )
    elapsed = time.perf_counter() - t0
    # full job would be >= 1.5s * ceil(16/cores); cancel must beat a full
    # sequential run by a wide margin
    assert elapsed < 12.0
    assert calls


def test_no_callback_is_passthrough(spark):
    assert run_with_progress(spark, lambda: spark.range(5).count()) == 5
