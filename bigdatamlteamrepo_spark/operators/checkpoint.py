"""Lineage truncation for iterative DataFrame loops, with a
fault-tolerance knob.

Multi-round graph/label loops (LPA, k-core peel, PageRank, star
contraction) must truncate lineage every round or the logical plan
doubles per iteration (driver OOMs building plan strings long before
the data is big).  ``localCheckpoint`` does that with executor-local
storage — fine on one machine, but at cluster scale a SINGLE lost
executor invalidates its blocks and fails the whole multi-round job,
because the truncated lineage can no longer be replayed.

:func:`truncate` is the knob: when the caller has configured a
reliable checkpoint directory (``spark.sparkContext.setCheckpointDir``
— HDFS/S3 in production), rounds checkpoint THERE and survive executor
loss; otherwise the executor-local fast path is kept.  Results are
identical under both modes (pinned in ``tests/test_graphs.py``) — only
the storage and fault story differ, so local mode stays the default
for bench/driver runs and a cluster deployment opts in with one line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_dir_configured(df: DataFrame) -> bool:
    """True when a reliable checkpoint directory is set on this
    session's SparkContext."""
    return df.sparkSession.sparkContext.getCheckpointDir() is not None


def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and sever its lineage: reliable
    ``checkpoint`` when a checkpoint dir is configured, executor-local
    ``localCheckpoint`` otherwise.  Eager by default — iterative loops
    need the round's work done NOW, not replayed inside the next
    round's plan.  ``eager=False`` (r13, guide §2.4) is for NON-loop
    callers whose next action sequentially consumes the frame anyway
    (e.g. the overlap join's auto-bin aggregate): the first job fills
    the checkpoint and the dedicated materialization barrier
    disappears; reuse semantics are unchanged."""
    if checkpoint_dir_configured(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
