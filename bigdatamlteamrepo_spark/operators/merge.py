"""MERGE (upsert/delete) semantics without a table format.

Lakehouse formats expose ``MERGE INTO``; with plain parquet the same
semantics is one full-outer join against the update batch followed by
a rewrite of the AFFECTED partitions.  This module implements the join
step as pure DataFrame algebra:

  * matched + ``delete_col`` true  → row dropped
  * matched                        → update columns win
  * update-only (not matched)      → inserted
  * target-only                    → kept as-is

Scale notes: the join keys on the merge key (one shuffle; broadcast
when the batch is small — the common CDC case), and a real deployment
pairs this with partition pruning: join the batch's distinct partition
values first, rewrite only those partitions (the helper
:func:`affected_partitions` computes that set).  Every row operation
is deterministic — last-writer-wins inside a batch must be resolved by
the caller BEFORE merging (enforced here by a uniqueness check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merged snapshot of ``target`` with ``updates`` applied.

    ``updates`` must have at most one row per key (raises otherwise —
    silent last-writer-wins inside a batch is how CDC pipelines corrupt
    data); its non-key columns replace the target's on match.
    ``delete_col``: optional boolean column in ``updates`` marking rows
    to remove instead of upsert.
    """
    dup = updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(
            "updates batch has multiple rows for at least one merge key; "
            "resolve last-writer-wins upstream (e.g. max_by on a version "
            "column) before merging"
        )
    data_cols = [c for c in target.columns if c != key]
    u = updates
    if delete_col is not None:
        deletes = u.filter(F.col(delete_col) == True)  # noqa: E712
        u = u.filter((F.col(delete_col) == False) | F.col(delete_col).isNull())  # noqa: E712
        target = target.join(deletes.select(key), key, "left_anti")
    # presence flag, NOT coalesce: an update that explicitly sets a
    # column to NULL must win — coalesce would resurrect the old value
    u = u.select(
        key,
        F.lit(True).alias("__m"),
        *[F.col(c).alias(f"__u_{c}") for c in data_cols],
    )
    merged = target.join(u, key, "full_outer").select(
        key,
        *[
            F.when(F.col("__m"), F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            for c in data_cols
        ],
    )
    return merged


def affected_partitions(updates: DataFrame, partition_col: str) -> list:
    """Distinct partition values touched by the batch — the set a
    partitioned-parquet deployment rewrites (everything else is
    untouched on disk)."""
    return [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
