"""Tests: antimeridian helpers + physical-plan assertions (pushdown,
broadcast, no-Python in JVM paths)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GRID_PAGES, box_ring
from datacube_core_spark.geom.lonlat import (
    chop_along_antimeridian,
    clip_lon180,
    lonlat_bounds,
)
from datacube_core_spark.geom.polygon import points_strictly_inside_multi

from .conftest import SF_TINY


def test_lonlat_bounds_safe_mode():
    # shape crossing the dateline stored with wrapped (negative) east part
    mp = [[np.array([(175.0, 0.0), (-175.0, 0.0), (-175.0, 10.0), (175.0, 10.0)])]]
    bb_quick = lonlat_bounds(mp, "quick")
    assert bb_quick.left == -175.0 and bb_quick.right == 175.0  # naive, wrong span
    bb = lonlat_bounds(mp, "safe")
    assert (bb.left, bb.right) == (175.0, 185.0)  # unwrapped, tight
    assert (bb.bottom, bb.top) == (0.0, 10.0)

    # non-wrapping shape unchanged by safe mode
    mp2 = [[box_ring(-30, -10, 40, 10)]]
    assert lonlat_bounds(mp2, "safe") == lonlat_bounds(mp2, "quick")


def test_clip_lon180():
    assert clip_lon180(-180.0 + 1e-9) == 180.0
    assert clip_lon180(180.0 - 1e-9) == 180.0 - 1e-9
    assert clip_lon180(-179.5) == -179.5


def test_chop_along_antimeridian():
    # extended-longitude box 175..185 → two parts: 175..180 and -180..-175
    mp = [[box_ring(175.0, 0.0, 185.0, 10.0)]]
    parts = chop_along_antimeridian(mp)
    assert len(parts) == 2
    xs = np.array([(177.0, -177.0), (5.0, 5.0)]).T
    inside = points_strictly_inside_multi(xs[:, 0], xs[:, 1], parts)
    assert inside.tolist() == [True, True]
    # nothing outside the band
    out = points_strictly_inside_multi(np.array([170.0, -170.0]), np.array([5.0, 5.0]), parts)
    assert out.tolist() == [False, False]


# ---------------------------------------------------------------------------
# physical-plan assertions — the "is it actually the plan we want" gate
# ---------------------------------------------------------------------------

def test_pushdown_reaches_parquet_scan(spark):
    from datacube_core_spark.catalog import PageIndex

    idx = PageIndex(spark, SF_TINY)
    df = idx.search_returning(["doc_id"], lang="en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan or "EqualTo(lang,en)" in plan
    # column pruning: html/text must not be read
    assert "html" not in plan.split("ReadSchema")[-1][:300]


def test_pip_rect_path_has_no_python(spark):
    from datacube_core_spark.operators.pip import PipIndex
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.sources.regions import regions

    p = pages(spark, SF_TINY)
    index = PipIndex(spark, regions(spark), GRID_PAGES)
    out = index.join(p, keep_cols=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, "rect-region PIP must be pure JVM"
    assert "BroadcastHashJoin" in plan


def test_minhash_plan_is_jvm(spark):
    from datacube_core_spark.operators.dedup import minhash_signatures
    from datacube_core_spark.sources.corpus import dedup_corpus

    sig = minhash_signatures(dedup_corpus(spark, SF_TINY))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_cos_neardup_has_no_cartesian_product(spark):
    """The embedding near-dup entry must be the LSH-bucketed plan: an
    equi-join on the hyperplane code, never a cartesian product."""
    import __spark_entry__ as entry_mod

    out = entry_mod.q_cos_neardup(spark, SF_TINY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r7: the per-pair cosine is a deliberate Arrow pandas UDF (the
    # vectorized sequential-fold kernel); only the row-pickled form
    # is forbidden
    assert "BatchEvalPython" not in plan


# (test_knn_join_is_broadcast removed: knn_join now localCheckpoints each
# escalation round, truncating the lineage the plan-grep inspected.  The
# broadcast-hint contract is asserted at the call site instead — see the
# F.broadcast spy tests in test_pip_knn_spark.py.)


def test_all_entry_plans_are_scale_shaped(spark):
    """Sweeping plan gate over EVERY entry query: no row-at-a-time Python
    (EvalPython/BatchEvalPython) anywhere, and no cartesian product except
    the deliberate brute-force baselines (ann_topk broadcasts a tiny query
    side through crossJoin; knn's ring table is a broadcast cross of ring
    offsets — bounded by (2r+1)^2, not data-sized)."""
    import __spark_entry__ as entry_mod

    # documented brute-force/ring shapes (knn/knn_bulk cross a CONSTANT
    # (2r+1)^2 ring-offset table against queries — bounded, not data-sized;
    # dsir_weights crosses the n_buckets-row count table with a ONE-ROW
    # broadcast totals aggregate — the canonical scalar-join shape, bounded
    # by construction regardless of corpus size)
    CARTESIAN_OK = {"ann_topk", "knn", "knn_bulk", "knn_dense", "dsir_weights"}
    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        df = fn(spark, SF_TINY)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # ArrowEvalPython is a VECTORIZED pandas_udf (Arrow batches, e.g.
        # the S2 cell-id kernel) — strip it so the row-at-a-time check
        # only catches genuine BatchEvalPython/EvalPython nodes
        depythoned = plan.replace("ArrowEvalPython", "")
        if "BatchEvalPython" in depythoned or "EvalPython " in depythoned:
            failures.append(f"{name}: row-at-a-time Python")
        cartesian = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        if cartesian and name not in CARTESIAN_OK:
            failures.append(f"{name}: cartesian product")
    assert not failures, failures
