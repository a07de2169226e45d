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
    # localCheckpoint per iteration truncates the growing plan lineage —
    # without it each fixpoint test re-executes every prior join and the
    # loop goes quadratic in depth
    edges = edges.localCheckpoint(eager=True)
    result = frontier.localCheckpoint(eager=True)
    frontier = result
    for depth in range(1, max_depth + 1):
        step = (
            frontier.join(edges, frontier["node"] == edges[frm], "inner")
            .select("root_id", F.col(to).alias("node"), F.lit(depth).alias("distance"))
        )
        # drop nodes already reached (keeps the shortest distance)
        seen = result.select(F.col("root_id").alias("r2"), F.col("node").alias("n2"))
        step = (
            step.join(seen, (step["root_id"] == seen["r2"]) & (step["node"] == seen["n2"]), "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if len(step.take(1)) == 0:
            break
        result = result.unionByName(step).localCheckpoint(eager=True)
        frontier = step
    return result
