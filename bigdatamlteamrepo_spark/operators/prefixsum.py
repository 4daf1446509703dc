"""Distributed global running sum — the parallel prefix-sum
decomposition Spark's window API doesn't give you.

``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with no
PARTITION BY moves the whole frame to ONE task (Spark even logs the
WindowExec warning) — fine for the calendar-sized frames the registered
faces use it on, fatal for a 100 TB event stream.  The classic fix
(Blelloch scan, the same two-phase shape every GPU/MPI prefix sum
uses):

1. range-partition by the sort key, running sum WITHIN each partition
   (bounded by partition size);
2. one tiny per-partition total frame, running-summed on the driver
   scale (|partitions| rows) into per-partition OFFSETS;
3. broadcast the offsets back and add.

The result is the exact global running sum no matter where the sampled
range boundaries fall: the within/offset split telescopes, so the
output is deterministic even though ``repartitionByRange`` boundaries
are not — provided the sort key tuple is UNIQUE per row (ties could
straddle a boundary with their relative order unobservable; pass
``validate=True`` to turn that contract into a fail-fast check at the
cost of one bounded aggregate).

The scanned frame is ALWAYS truncated (reliable ``checkpoint`` under a
checkpoint dir, executor-local otherwise) before fan-out: it feeds both
the per-partition totals and the final join, and without truncation the
two branches would re-evaluate ``repartitionByRange`` independently —
its nondeterministic boundary sampling could then assign DIFFERENT
``__pid`` values per branch, silently corrupting the offsets.  That
makes materialization a correctness requirement here, not a performance
knob (it also happens to be the fast path: the un-materialized scan
LOST to the serial window at 50 M rows, 40 s vs 27 s, while the
materialized one beats it ~5× — `tools/prefixsum_scaling.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class AmbiguousOrderError(ValueError):
    """``order_cols`` contained duplicate key tuples — the requested
    running sum is ill-defined (raised only under ``validate=True``)."""


def partitioned_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
    validate: bool = False,
) -> DataFrame:
    """Exact global ``SUM(value_col) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` without a single-partition sort.

    ``order_cols`` must be a TOTAL order (unique tuple per row) — with
    duplicate keys the running sum at the duplicates depends on an
    order the caller never specified, in ANY engine.  ``validate=True``
    enforces that contract eagerly (one count-vs-distinct-count scalar
    aggregate over the already-materialized frame) and raises
    :class:`AmbiguousOrderError` instead of silently returning one of
    several valid outputs.  Output adds ``out_col``; all input columns
    pass through.

    The operator is EAGER at construction: the shuffled+windowed frame
    is truncated once before feeding the totals aggregate and the final
    join (see module docstring for why this is a correctness
    requirement, not an option).
    """
    from bigdatamlteamrepo_spark.operators.checkpoint import truncate

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__run", F.sum(value_col).over(w_in))
    d = truncate(d)
    if validate:
        amb = d.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*order_cols))
            ).alias("dups")
        ).collect()[0]["dups"]
        if amb:
            raise AmbiguousOrderError(
                f"order_cols {order_cols} are not a total order: "
                f"{amb} row(s) share a key tuple with another row — the "
                "running sum at the duplicates would depend on an "
                "unspecified order"
            )
    totals = d.groupBy("__pid").agg(F.sum(value_col).alias("__t"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__run") + F.col("__off"))
        .drop("__pid", "__run", "__off")
    )
