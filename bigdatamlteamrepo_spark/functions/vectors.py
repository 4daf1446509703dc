"""Vector math over ``array<float>`` columns as pure expressions.

``zip_with`` + ``aggregate`` fold sequentially over array elements, so
a dot product over a 64-dim embedding is a fixed-order chain of IEEE
double ops — bit-deterministic and cheap (no UDF, no shuffle).  Used by
the similarity-search operators (brute-force top-k and LSH variants).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return arr.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, as double."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm via the same sequential fold."""
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def dot_expr(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`dot` (sequential list fold, double math)."""
    return (
        f"list_sum(list_transform(range(1, len({a_sql}) + 1), "
        f"i -> CAST({a_sql}[i] AS DOUBLE) * CAST({b_sql}[i] AS DOUBLE)))"
    )


def norm_expr(a_sql: str) -> str:
    """DuckDB twin of :func:`l2_norm`."""
    return (
        f"sqrt(list_sum(list_transform({a_sql}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance, sequential fold (bit-deterministic)."""
    diffs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_sq_expr(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`l2_sq`."""
    return (
        f"list_sum(list_transform(range(1, len({a_sql}) + 1), "
        f"i -> (CAST({a_sql}[i] AS DOUBLE) - CAST({b_sql}[i] AS DOUBLE)) "
        f"* (CAST({a_sql}[i] AS DOUBLE) - CAST({b_sql}[i] AS DOUBLE))))"
    )
