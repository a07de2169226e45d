"""Snapshot differential: added / removed / changed / same between crawls.

Re-crawl pipelines diff a new snapshot against the previous one before
spending downstream compute: unchanged pages skip re-extraction and
re-dedup, changed pages invalidate caches, removed pages tombstone the
index.  Reference analog: ODC validates dataset-document updates by
computing a structured change set between the stored and offered
documents (``datacube/utils/changes.py:get_doc_changes`` — per-field
diffs driving allowed-update policies); at crawl scale the unit is the
page fingerprint, not the field, and the change set is a DataFrame.

Scale shape: ONE full-outer sort-merge join on the key (both sides
shuffle-partitioned by key; at a fixed layout — e.g. both snapshots
bucket-partitioned by url hash, the ``operators/ingest.py`` layout —
the join is co-located and shuffle-free).  Status classification is a
pure projection; the per-host rollup is a partial-agg groupBy.
Fingerprints should be precomputed content hashes (md5 column), never
raw payloads — the join then moves ~48 bytes/row no matter the page
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: classification values, fixed vocabulary
STATUSES = ("added", "removed", "changed", "same")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    fp_col: str = "fp",
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns (key_cols..., status) with status ∈ ``STATUSES``:
    ``added`` = key only in ``new``, ``removed`` = only in ``old``,
    ``changed`` = fingerprint differs, ``same`` otherwise.  NULL
    fingerprints are treated as distinct-from-everything (a NULL fp on
    one side of a matched key classifies as ``changed`` — re-fetch is
    the safe default)."""
    keys = list(key_cols)
    o = old.select(*keys, F.col(fp_col).alias("__fp_o"), F.lit(1).alias("__in_o"))
    n = new.select(*keys, F.col(fp_col).alias("__fp_n"), F.lit(1).alias("__in_n"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(
            F.col("__fp_o").isNotNull()
            & F.col("__fp_n").isNotNull()
            & (F.col("__fp_o") == F.col("__fp_n")),
            F.lit("same"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def sql_snapshot_diff(
    old_cte: str,
    new_cte: str,
    key_cols: tuple[str, ...],
    fp_col: str = "fp",
) -> str:
    """DuckDB twin (same presence markers + NULL-fp policy)."""
    keys = ", ".join(key_cols)
    using = ", ".join(key_cols)
    return f"""SELECT {keys},
       CASE WHEN o.__in_o IS NULL THEN 'added'
            WHEN n.__in_n IS NULL THEN 'removed'
            WHEN o.__fp_o IS NOT NULL AND n.__fp_n IS NOT NULL
                 AND o.__fp_o = n.__fp_n THEN 'same'
            ELSE 'changed' END AS status
FROM (SELECT {keys}, {fp_col} AS __fp_o, 1 AS __in_o FROM {old_cte}) o
FULL OUTER JOIN (SELECT {keys}, {fp_col} AS __fp_n, 1 AS __in_n FROM {new_cte}) n
USING ({using})"""
