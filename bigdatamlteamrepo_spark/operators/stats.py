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


def whitening_transform(
    emb: DataFrame, dims: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """ZCA-whiten the leading ``dims`` components: covariance moments
    from one exact aggregation pass (micro-quantized integer sums, cf.
    ``queries/similarity.py::embedding_covariance_stats``), the d×d
    eigendecomposition on the driver (bounded: d² scalars, never data),
    and the rotation applied as a broadcast matrix of literals — pure
    expressions, no UDF.  Output column ``white`` (array<double>) has
    ~identity sample covariance; the standard preprocessing before
    cosine/PQ ANN when dimensions are correlated."""
    import numpy as np
    from pyspark.sql import functions as F

    def xq(k: int):
        return (
            F.round(F.element_at(vec_col, k + 1).cast("double") * 1000000)
            .cast("bigint")
        )

    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(dims):
        aggs.append(F.sum(xq(i)).cast("bigint").alias(f"s_{i}"))
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(F.sum(xq(i) * xq(j)).cast("bigint").alias(f"p_{i}_{j}"))
    row = emb.agg(*aggs).collect()[0]  # bounded: 1 + d + d(d+1)/2 scalars
    n = row["n"]
    mu = np.array([row[f"s_{i}"] / 1e6 / n for i in range(dims)])
    cov = np.zeros((dims, dims))
    for i in range(dims):
        for j in range(i, dims):
            c = row[f"p_{i}_{j}"] / 1e12 / n - mu[i] * mu[j]
            cov[i, j] = cov[j, i] = c
    w, v = np.linalg.eigh(cov)
    zca = v @ np.diag(1.0 / np.sqrt(np.maximum(w, 1e-12))) @ v.T
    comps = []
    for i in range(dims):
        term = None
        for j in range(dims):
            t = (
                F.element_at(vec_col, j + 1).cast("double") - float(mu[j])
            ) * float(zca[i, j])
            term = t if term is None else term + t
        comps.append(term)
    return emb.withColumn("white", F.array(*comps))
