"""Provenance (lineage) traversal: recursive closure over source edges.

Reference: the postgres driver resolves dataset provenance with a
recursive CTE over ``dataset_source`` edges, tracking distance and path
(``drivers/postgres/_api.py:560-600``).  Spark 3.x/4.x Catalyst has no
recursive CTE, so the closure is an iterative join+union loop to a
fixpoint (SURVEY §4: "custom iterative loop") — each iteration is one
distributed job; depth is bounded by the longest provenance chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_closure(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int = 20,
    direction: str = "sources",
    levels_per_job: int = 4,
) -> DataFrame:
    """All ancestors (``sources``) or descendants (``derived``) of roots.

    ``edges``: (dataset_id, source_id) rows.  ``roots``: (dataset_id).
    Returns (root_id, dataset_id, distance) — distance 0 is the root.
    """
    if direction == "sources":
        frm, to = "dataset_id", "source_id"
    elif direction == "derived":
        frm, to = "source_id", "dataset_id"
    else:
        raise ValueError(direction)

    frontier = roots.select(
        F.col("dataset_id").alias("root_id"),
        F.col("dataset_id").alias("node"),
        F.lit(0).alias("distance"),
    )
    # localCheckpoint truncates the growing plan lineage — without it each
    # fixpoint test re-executes every prior join and the loop goes
    # quadratic in depth.  Checkpoint + empty-check only every
    # ``levels_per_job`` levels: each Spark action costs a fixed ~0.3s of
    # scheduling, so per-level actions dominate shallow closures.
    edges = edges.localCheckpoint(eager=True)
    result = frontier.localCheckpoint(eager=True)
    frontier = result
    depth = 0
    while depth < max_depth:
        batch_end = min(depth + levels_per_job, max_depth)
        new_steps = []
        step = frontier
        while depth < batch_end:
            depth += 1
            step = (
                step.join(edges, step["node"] == edges[frm], "inner")
                .select("root_id", F.col(to).alias("node"), F.lit(depth).alias("distance"))
            )
            new_steps.append(step)
        batch = new_steps[0]
        for s in new_steps[1:]:
            batch = batch.unionByName(s)
        # shortest distance per (root, node) within the batch, then drop
        # nodes already reached in earlier batches
        batch_min = batch.groupBy("root_id", "node").agg(F.min("distance").alias("distance"))
        seen = result.select(F.col("root_id").alias("r2"), F.col("node").alias("n2"))
        fresh = (
            batch_min.join(
                seen, (batch_min["root_id"] == seen["r2"]) & (batch_min["node"] == seen["n2"]), "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        if len(fresh.take(1)) == 0:
            break
        result = result.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh
    return result
