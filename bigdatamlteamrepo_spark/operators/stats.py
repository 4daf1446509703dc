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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for moment quantization (micro units)
_MOMENT_SCALE = 1_000_000


#: register-count exponent for the approx-NDV ANALYZE path: 2^6 = 64
#: registers per column → rsd ≈ 1.04/√64 ≈ 13%, the CBO regime (stats
#: need join-size ORDERING, not exact counts); 64 conditional-MAX aggs
#: per column keeps a whole-catalog sweep inside one codegen'd stage
ANALYZE_HLL_P = 6


def column_stats(
    df: DataFrame, cols: Sequence[str], approx_ndv: bool = False
) -> DataFrame:
    """(column_name, n_rows, ndv, n_nulls, min_value, max_value) per
    profiled column, min/max stringified so every type shares one
    schema.  One wide aggregation + a metadata-sized unpivot.

    ``approx_ndv``: replace each exact ``countDistinct`` with the
    portable HLL register sketch (operators/sketches.hll_agg_exprs,
    p=:data:`ANALYZE_HLL_P`).  countDistinct is the one expression in
    this ANALYZE that does NOT map-side-collapse — at 100 TB it
    partially shuffles each profiled column's distinct values, while
    the HLL path keeps the whole profile a single-pass agg whose state
    is 64 small ints per column regardless of cardinality.  Error
    bound (rsd ≈ 13%) pinned vs exact in tests/test_sketches.py."""
    from bigdatamlteamrepo_spark.operators.sketches import (
        h60,
        hll_agg_exprs,
        hll_agg_finalize,
    )

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        if approx_ndv:
            # NULLs must not feed the sketch (countDistinct skips them);
            # h60 of a NULL is NULL, which the register MAX ignores
            aggs += hll_agg_exprs(h60(F.col(c)), ANALYZE_HLL_P, prefix=f"c{i}r")
        else:
            aggs.append(F.countDistinct(c).cast("bigint").alias(f"ndv_{i}"))
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nulls_{i}"),
            F.min(c).cast("string").alias(f"min_{i}"),
            F.max(c).cast("string").alias(f"max_{i}"),
        ]
    a = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        ndv = (
            hll_agg_finalize(ANALYZE_HLL_P, prefix=f"c{i}r").cast("bigint")
            if approx_ndv
            else F.col(f"ndv_{i}")
        )
        parts.append(
            a.select(
                F.lit(c).alias("column_name"),
                "n_rows",
                ndv.alias("ndv"),
                F.col(f"nulls_{i}").alias("n_nulls"),
                F.col(f"min_{i}").alias("min_value"),
                F.col(f"max_{i}").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def moment_elem(vec_col: str, k: int) -> Column:
    """Micro-quantized k-th component (0-based) of an array column as an
    exact BIGINT — float32 inputs round-trip exactly through double."""
    return (
        F.round(F.element_at(vec_col, k + 1).cast("double") * _MOMENT_SCALE)
        .cast("bigint")
    )


def moment_aggs(vec_col: str, dims: int) -> list[Column]:
    """The covariance sufficient-statistic aggregates over the leading
    ``dims`` components: ``n`` plus first moments ``s_i = Σx_i`` and
    upper-triangle second moments ``p_i_j = Σx_i·x_j`` in micro units.

    Shared by :func:`whitening_transform` and
    ``queries.similarity.embedding_covariance_stats`` — one definition,
    two consumers.

    Accumulation is DECIMAL(38,0) (then cast back to BIGINT): per-row
    products are ~1e12 in magnitude, so a plain BIGINT sum of
    same-signed unit-scale components overflows around ~9e6 rows — far
    below production corpus sizes.  DECIMAL(38,0) raises the bound to
    ~1e26 rows and mirrors DuckDB, whose SUM(BIGINT) already widens to
    HUGEINT before the oracle's final BIGINT cast.  Values (and the
    output schema) are unchanged at any scale where both fit.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_vecs")]
    for i in range(dims):
        aggs.append(
            F.sum(moment_elem(vec_col, i).cast("decimal(38,0)"))
            .cast("bigint")
            .alias(f"s_{i}")
        )
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(
                F.sum(
                    (moment_elem(vec_col, i) * moment_elem(vec_col, j)).cast(
                        "decimal(38,0)"
                    )
                )
                .cast("bigint")
                .alias(f"p_{i}_{j}")
            )
    return aggs


def whitening_transform(
    emb: DataFrame, dims: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """ZCA-whiten the leading ``dims`` components: covariance moments
    from one exact aggregation pass (:func:`moment_aggs` — the same
    sufficient statistics ``embedding_covariance_stats`` exposes as a
    query), the d×d eigendecomposition on the driver (bounded: d²
    scalars, never data), and the rotation applied as a broadcast
    matrix of literals — pure expressions, no UDF.  Output column
    ``white`` (array<double>) has ~identity sample covariance; the
    standard preprocessing before cosine/PQ ANN when dimensions are
    correlated."""
    import numpy as np

    row = emb.agg(*moment_aggs(vec_col, dims)).collect()[0]  # 1 + d + d(d+1)/2 scalars
    n = row["n_vecs"]
    if n == 0:
        raise ValueError("whitening_transform: input frame has no rows")
    mu = np.array([row[f"s_{i}"] / _MOMENT_SCALE / n for i in range(dims)])
    cov = np.zeros((dims, dims))
    for i in range(dims):
        for j in range(i, dims):
            c = row[f"p_{i}_{j}"] / _MOMENT_SCALE**2 / n - mu[i] * mu[j]
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
