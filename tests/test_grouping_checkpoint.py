"""Tests: group_datasets ordering, fuser golden rules, time parsing,
bitmask predicates, checkpoint/resume."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.operators.checkpoint import CheckpointedJob
from datacube_core_spark.operators.grouping import (
    fuse_first_valid,
    group_datasets,
    solar_day_col,
    time_bucket_col,
)
from datacube_core_spark.plans.query import (
    Query,
    Range,
    flags_to_mask_value,
    make_mask_pred,
    time_to_search_dims,
    value_between_pred,
)


def test_group_datasets_sort_and_tiebreak(spark):
    rows = [
        # (id, ts_label, sort_val): same label + same sort -> id tie-break
        (3, "a", 10.0), (1, "a", 10.0), (2, "a", 5.0),
        (5, "b", 1.0), (4, "b", 2.0),
    ]
    df = spark.createDataFrame(rows, "id LONG, label STRING, sv DOUBLE")
    out = group_datasets(df, F.col("label"), F.col("sv"), "id", ["id"], dimension="grp").collect()
    assert [r["grp"] for r in out] == ["a", "b"]
    a = [e["_id"] for e in out[0]["datasets"]]
    assert a == [2, 1, 3]  # sv=5 first; then sv=10 tie-broken by id 1 < 3
    b = [e["_id"] for e in out[1]["datasets"]]
    assert b == [5, 4]


def test_fuser_golden_rules(spark):
    # reference tests/storage/test_storage.py:32-124 semantics:
    # first source wins; later sources fill only nodata holes
    nodata = -1.0
    rows = [
        (0, 0, 1, 0.0, [1.0, -1.0, 3.0, -1.0]),
        (0, 0, 2, 1.0, [9.0, 2.0, 9.0, -1.0]),
        (0, 0, 3, 2.0, [7.0, 7.0, 7.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")
    out = fuse_first_valid(df, ["tx", "ty"], F.col("sv"), "id", "arr", nodata).collect()
    assert len(out) == 1
    assert out[0]["fused"] == [1.0, 2.0, 3.0, 4.0]
    assert out[0]["n_sources"] == 3

    # NaN-nodata variant
    nan = float("nan")
    rows2 = [
        (0, 0, 1, 0.0, [1.0, nan]),
        (0, 0, 2, 1.0, [5.0, 2.0]),
    ]
    df2 = spark.createDataFrame(rows2, "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")
    out2 = fuse_first_valid(df2, ["tx", "ty"], F.col("sv"), "id", "arr", nan).collect()
    assert out2[0]["fused"] == [1.0, 2.0]

    # single source passes through
    df3 = spark.createDataFrame([(1, 1, 9, 0.0, [8.0, -1.0])], "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")
    out3 = fuse_first_valid(df3, ["tx", "ty"], F.col("sv"), "id", "arr", -1.0).collect()
    assert out3[0]["fused"] == [8.0, -1.0]


def test_time_parsing_period_snapping():
    # FIXTURES.md §4.7 (reference api/query.py:306-344)
    r = time_to_search_dims("2000")
    assert r.begin == datetime.datetime(2000, 1, 1, 0, 0)
    assert r.end == datetime.datetime(2000, 12, 31, 23, 59, 59, 999999)

    r = time_to_search_dims("2000-03")
    assert r.begin == datetime.datetime(2000, 3, 1)
    assert r.end == datetime.datetime(2000, 3, 31, 23, 59, 59, 999999)

    r = time_to_search_dims(("2000", "2001-06"))
    assert r.begin == datetime.datetime(2000, 1, 1)
    assert r.end == datetime.datetime(2001, 6, 30, 23, 59, 59, 999999)

    r = time_to_search_dims(("2000", None))
    assert r.begin == datetime.datetime(2000, 1, 1)
    assert r.end >= datetime.datetime(2026, 1, 1)

    with pytest.raises(ValueError):
        time_to_search_dims(("2000", "2001", "2002"))
    with pytest.raises(TypeError):
        time_to_search_dims(2000)


def test_query_predicate(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 5.0, datetime.datetime(2024, 3, 10), "en"),
         (2, 50.0, 5.0, datetime.datetime(2024, 3, 10), "de"),
         (3, 5.0, 5.0, datetime.datetime(2025, 1, 1), "en")],
        "doc_id LONG, lon DOUBLE, lat DOUBLE, warc_ts TIMESTAMP, lang STRING",
    )
    q = Query(x=(0, 10), y=(0, 10), time="2024", lang="en")
    got = sorted(r["doc_id"] for r in q.apply(df).collect())
    assert got == [1]


def test_bitmask_predicates(spark):
    df = spark.createDataFrame([(0b1010,), (0b0010,), (0b1000,)], "flags LONG")
    # bits 1 (cloud) and 3 (shadow)
    defs = {
        "cloud": {"bits": 1, "values": {0: "no_cloud", 1: "cloud"}},
        "shadow": {"bits": 3, "values": {0: False, 1: True}},
    }
    mask, value = flags_to_mask_value(defs, cloud="cloud", shadow=True)
    assert mask == 0b1010 and value == 0b1010
    got = df.where(make_mask_pred(F.col("flags"), mask, value)).collect()
    assert [r["flags"] for r in got] == [0b1010]


def test_value_between_half_open(spark):
    df = spark.createDataFrame([(1,), (5,), (10,)], "v INT")
    got = sorted(r["v"] for r in df.where(value_between_pred(F.col("v"), 1, 10)).collect())
    assert got == [1, 5]  # 10 excluded: half-open


def test_fiscal_year_bucket(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 6, 30),), (datetime.datetime(2024, 7, 1),)], "ts TIMESTAMP"
    )
    out = df.select(time_bucket_col(F.col("ts"), "fiscal_year").alias("fy")).collect()
    # Q-JUN: FY label = year containing the period end (Jun 30)
    assert out[0]["fy"] == datetime.date(2024, 1, 1)
    assert out[1]["fy"] == datetime.date(2025, 1, 1)


def test_checkpoint_resume_no_recompute(spark, tmp_path):
    base = str(tmp_path / "job")
    cells = spark.createDataFrame([(x, y) for x in range(4) for y in range(2)], "cell_x INT, cell_y INT")
    calls = []

    def make_processor(tag):
        def process(batch):
            calls.append((tag, tuple(batch)))
            rows = [(cx, cy, f"{tag}:{cx},{cy}") for cx, cy in batch]
            return spark.createDataFrame(rows, "cell_x INT, cell_y INT, payload STRING"), len(rows)
        return process

    job1 = CheckpointedJob(spark, base, job_id="run1")
    ran1 = job1.run(cells, make_processor("r1"), batch_size=2, max_batches=2)  # "killed" after 2 batches
    assert ran1 == 2
    assert job1.completed_cells().count() == 4

    job2 = CheckpointedJob(spark, base, job_id="run2")
    ran2 = job2.run(cells, make_processor("r2"), batch_size=2)
    assert ran2 == 2  # only the remaining 4 cells, in 2 batches

    done_cells = {(int(r["cell_x"]), int(r["cell_y"])) for r in job2.completed_cells().collect()}
    assert len(done_cells) == 8

    out = job2.committed_output().collect()
    assert len(out) == 8  # every cell exactly once — no recompute, no dupes
    processed_by_r2 = {c for tag, batch in calls if tag == "r2" for c in batch}
    processed_by_r1 = {c for tag, batch in calls if tag == "r1" for c in batch}
    assert not (processed_by_r1 & processed_by_r2)

    # lineage + metrics recorded for every cell
    assert job2.lineage().count() == 8
    assert job2.metrics().count() == 8


def test_checkpoint_crash_inside_commit_window(spark, tmp_path):
    """The hard kill: dies AFTER a batch's output append but BEFORE its
    checkpoint append.  The orphaned batch directory must never be read
    (no duplicates when the retry re-processes the batch)."""
    import pytest as _pytest

    base = str(tmp_path / "job")
    cells = spark.createDataFrame([(x, 0) for x in range(4)], "cell_x INT, cell_y INT")

    def process(batch):
        rows = [(cx, cy, f"{cx},{cy}") for cx, cy in batch]
        return spark.createDataFrame(rows, "cell_x INT, cell_y INT, payload STRING"), len(rows)

    job1 = CheckpointedJob(spark, base, job_id="run1")
    with _pytest.raises(RuntimeError, match="commit window"):
        job1.run(cells, process, batch_size=2, fail_before_checkpoint=2)
    assert job1.completed_cells().count() == 2  # only batch 1 committed

    job2 = CheckpointedJob(spark, base, job_id="run2")
    ran = job2.run(cells, process, batch_size=2)
    assert ran == 1  # just the 2 uncommitted cells

    out = job2.committed_output().collect()
    assert len(out) == 4, "orphaned first-attempt rows must not surface"
    assert {(int(r["cell_x"]), int(r["cell_y"])) for r in out} == {(x, 0) for x in range(4)}


def test_checkpoint_crash_resume_same_job_id(spark, tmp_path):
    """Retry under the SAME job_id (the natural resume, constructor-
    supported) after a kill inside the commit window: the per-attempt
    batch_id nonce must keep the retry's partitions disjoint from the
    orphaned first-attempt directory — no duplicate rows may surface."""
    import pytest as _pytest

    base = str(tmp_path / "job")
    cells = spark.createDataFrame([(x, 0) for x in range(4)], "cell_x INT, cell_y INT")

    def process(batch):
        rows = [(cx, cy, f"{cx},{cy}") for cx, cy in batch]
        return spark.createDataFrame(rows, "cell_x INT, cell_y INT, payload STRING"), len(rows)

    job1 = CheckpointedJob(spark, base, job_id="same-job")
    with _pytest.raises(RuntimeError, match="commit window"):
        job1.run(cells, process, batch_size=2, fail_before_checkpoint=2)

    job2 = CheckpointedJob(spark, base, job_id="same-job")  # SAME id
    ran = job2.run(cells, process, batch_size=2)
    assert ran == 1

    out = job2.committed_output().collect()
    assert len(out) == 4, "same-job_id retry re-filled the orphaned partition"
    assert {(int(r["cell_x"]), int(r["cell_y"])) for r in out} == {(x, 0) for x in range(4)}


def test_committed_output_empty_safe(spark, tmp_path):
    job = CheckpointedJob(spark, str(tmp_path / "nothing-yet"), job_id="x")
    assert job.committed_output().count() == 0
    assert job.committed_output("cell_x INT, cell_y INT, v STRING").columns == [
        "cell_x", "cell_y", "v",
    ]


def test_salted_fuse_equals_unsalted(spark):
    import random

    from datacube_core_spark.operators.grouping import fuse_first_valid_salted

    rng = random.Random(7)
    nodata = -1.0
    rows = []
    for tx in range(3):
        for ty in range(2):
            for sid in range(25):  # 25 overlapping sources per tile
                arr = [
                    (rng.random() * 10 if rng.random() > 0.5 else nodata)
                    for _ in range(6)
                ]
                rows.append((tx, ty, sid, float(sid % 7), arr))
    df = spark.createDataFrame(rows, "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")

    plain = {
        (r["tx"], r["ty"]): (list(r["fused"]), r["n_sources"])
        for r in fuse_first_valid(df, ["tx", "ty"], F.col("sv"), "id", "arr", nodata).collect()
    }
    for factor in (1, 4, 16):
        salted = {
            (r["tx"], r["ty"]): (list(r["fused"]), r["n_sources"])
            for r in fuse_first_valid_salted(
                df, ["tx", "ty"], F.col("sv"), "id", "arr", nodata, salt_factor=factor
            ).collect()
        }
        assert salted == plain, f"salt_factor={factor}"


def test_salted_fuse_nan_nodata(spark):
    from datacube_core_spark.operators.grouping import fuse_first_valid_salted

    nan = float("nan")
    rows = [
        (0, 0, 1, 0.0, [1.0, nan, nan]),
        (0, 0, 2, 1.0, [5.0, 2.0, nan]),
        (0, 0, 3, 2.0, [7.0, 7.0, 7.0]),
    ]
    df = spark.createDataFrame(rows, "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")
    out = fuse_first_valid_salted(df, ["tx", "ty"], F.col("sv"), "id", "arr", nan, salt_factor=3).collect()
    assert out[0]["fused"] == [1.0, 2.0, 7.0]
    assert out[0]["n_sources"] == 3


def test_kernel_fuse_equals_catalyst(spark):
    import random

    from datacube_core_spark.operators.grouping import fuse_first_valid_kernel

    rng = random.Random(11)
    nodata = -1.0
    rows = []
    for tx in range(2):
        for sid in range(30):
            arr = [(rng.random() * 9 if rng.random() > 0.4 else nodata) for _ in range(5)]
            rows.append((tx, 0, sid, float(sid % 5), arr))
    df = spark.createDataFrame(rows, "tx INT, ty INT, id LONG, sv DOUBLE, arr ARRAY<DOUBLE>")
    plain = {
        (r["tx"], r["ty"]): (list(r["fused"]), r["n_sources"])
        for r in fuse_first_valid(df, ["tx", "ty"], F.col("sv"), "id", "arr", nodata).collect()
    }
    kern = {
        (r["tx"], r["ty"]): (list(r["fused"]), r["n_sources"])
        for r in fuse_first_valid_kernel(df, ["tx", "ty"], ["sv"], "id", "arr", nodata).collect()
    }
    assert kern == plain


def test_vacuum_removes_only_orphans(spark, tmp_path):
    """vacuum() deletes batch dirs written by a killed attempt (never
    committed) and leaves every committed batch untouched."""
    import os
    import pytest as _pytest

    base = str(tmp_path / "job")
    cells = spark.createDataFrame([(x, 0) for x in range(4)], "cell_x INT, cell_y INT")

    def process(batch):
        rows = [(cx, cy, f"{cx},{cy}") for cx, cy in batch]
        return spark.createDataFrame(rows, "cell_x INT, cell_y INT, payload STRING"), len(rows)

    job1 = CheckpointedJob(spark, base, job_id="v1")
    with _pytest.raises(RuntimeError, match="commit window"):
        job1.run(cells, process, batch_size=2, fail_before_checkpoint=2)

    job2 = CheckpointedJob(spark, base, job_id="v1")
    job2.run(cells, process, batch_size=2)

    dirs_before = {d for d in os.listdir(job2.output_path) if d.startswith("batch_id=")}
    committed = {r["batch_id"] for r in job2.committed_batches().collect()}
    assert len(dirs_before) == len(committed) + 1  # one orphan from the kill

    before = sorted(map(tuple, job2.committed_output().collect()))
    assert job2.vacuum() == []  # default min_age guards live-attempt race
    deleted = job2.vacuum(min_age_s=0)
    assert len(deleted) == 1 and deleted[0] not in committed

    dirs_after = {d for d in os.listdir(job2.output_path) if d.startswith("batch_id=")}
    assert dirs_after == {f"batch_id={b}" for b in committed}
    assert sorted(map(tuple, job2.committed_output().collect())) == before
    assert job2.vacuum(min_age_s=0) == []  # idempotent
