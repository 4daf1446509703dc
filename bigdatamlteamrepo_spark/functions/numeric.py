"""Deterministic ("oracle-stable") numeric aggregates.

Floating-point SUM/AVG depend on accumulation order, which differs
between Spark partial/final aggregation and any single-threaded oracle
(and between two Spark runs with different partitioning).  At 100 TB the
partial-agg tree is thousands of tasks deep, so plain ``SUM(double)``
is nondeterministic at the ULP level.

Fix: round each input row to a fixed decimal scale ONCE (a per-row,
order-independent operation), sum exactly in decimal (Spark widens
precision by 10 digits — no overflow for < 10^10 rows of 10^8-scale
values), then cast the exact result to double.  Every engine that
follows the same recipe produces bit-identical results regardless of
partitioning, which is what the driver's value-hash comparison needs.

AVG is expressed as exact-decimal-sum (as double) / count — one IEEE
division on identical inputs is itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default decimal type for money-like doubles
DEFAULT_PRECISION = 30
DEFAULT_SCALE = 6


def dsum(col: Column | str, scale: int = DEFAULT_SCALE, precision: int = DEFAULT_PRECISION) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = DEFAULT_SCALE, precision: int = DEFAULT_PRECISION) -> Column:
    """Order-independent AVG: exact decimal sum (as double) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(F.lit(1))


def dec(col: Column | str, precision: int, scale: int) -> Column:
    """Per-row decimal cast.  CAUTION (learned the hard way): casting a
    *double product* to a decimal whose scale equals the product's true
    decimal length (e.g. price² at scale 4 for 2-decimal prices) lands
    the cast on engine-specific rounding paths — Spark goes through the
    double's shortest string repr, other engines multiply-and-round —
    and the engines disagree on boundary values.  Rule: cast the raw
    *factors* to decimal (their true scale is well inside the cast
    scale) and multiply in exact decimal arithmetic instead of casting
    the product.  See segment_price_variance / q1 revenue expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum_expr(sql_expr: str, scale: int = DEFAULT_SCALE, precision: int = DEFAULT_PRECISION) -> str:
    """ANSI-SQL twin of :func:`dsum` for the DuckDB oracle."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_expr(sql_expr: str, scale: int = DEFAULT_SCALE, precision: int = DEFAULT_PRECISION) -> str:
    """ANSI-SQL twin of :func:`davg`."""
    return f"({dsum_expr(sql_expr, scale, precision)} / COUNT(*))"
