"""ANALYZE-style column statistics: one aggregation pass per table.

The per-column (rows, nulls, exact NDV, min, max) profile a cost-based
optimizer, data-quality monitor, or file-skipping layer consumes.
Exact multi-column COUNT(DISTINCT) makes Spark expand the input once
per profiled column — acceptable for audits; a 100 TB production
ANALYZE swaps in the sketch tier's HLL/KMV estimates (same output
shape, one expansion-free pass — ``queries/sketches.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column_name, n_rows, ndv, n_nulls, min_value, max_value) per
    profiled column, min/max stringified so every type shares one
    schema.  One wide aggregation + a metadata-sized unpivot."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.countDistinct(c).cast("bigint").alias(f"ndv_{i}"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nulls_{i}"),
            F.min(c).cast("string").alias(f"min_{i}"),
            F.max(c).cast("string").alias(f"max_{i}"),
        ]
    a = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            a.select(
                F.lit(c).alias("column_name"),
                "n_rows",
                F.col(f"ndv_{i}").alias("ndv"),
                F.col(f"nulls_{i}").alias("n_nulls"),
                F.col(f"min_{i}").alias("min_value"),
                F.col(f"max_{i}").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
