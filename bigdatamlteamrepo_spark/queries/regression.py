"""Grouped simple linear regression (OLS) from exact integer moments.

The per-segment trend-line workload (price–quantity elasticity per
brand): for every group, fit y = a + b·x by ordinary least squares and
report slope, intercept, and R² — the feature-diagnostics companion to
the Pearson matrix in ``queries/analytic.py`` (same float discipline,
extended from correlation to the full fit).

Float discipline (the house rule for cross-engine doubles): the five
moments per group (n, Σx, Σy, Σx², Σxy, Σy²) are EXACT integers —
values quantized to cents row-locally, per-row products ≤ 1e14 in
BIGINT, group sums in Spark DECIMAL(38,0) / DuckDB HUGEINT — so the
reduction is order-free; each exact moment is cast to double ONCE and
the textbook formulas run row-locally on the per-group moment row, the
identical expression text in both engines.

Scale shape: ONE map-side-combinable aggregation per group over the
fact⋈dim join (dim broadcast), no second pass — the regression is a
constant-width reduction, exactly as cheap as a grouped mean.  Groups
with zero x-variance would divide by zero; TPC-H brands always spread
quantity 1..50, and the formulas share the denominators with the
Pearson face whose non-degeneracy the driver corpus pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: moment columns: quantity (x) and extended price (y), both in cents
_X, _Y = "l_quantity", "l_extendedprice"

#: shared double expressions over the exact moment columns
#: (n, sx, sy, sxx, sxy, syy) — identical text in Spark and DuckDB.
#: slope is cents-per-cent == dollars-per-unit; intercept converts
#: cents → dollars (/100).
_SLOPE = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)"
)
_INTERCEPT = (
    "round(((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE)) / 100.0, 6)"
)
_R2 = (
    "round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
)

_OLS_ORACLE = f"""
WITH cents AS (
  SELECT p.p_brand,
         CAST(round(l.{_X} * 100) AS BIGINT) AS x,
         CAST(round(l.{_Y} * 100) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
m AS (
  SELECT p_brand,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM cents GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       {_SLOPE} AS slope,
       {_INTERCEPT} AS intercept,
       {_R2} AS r2
FROM m
"""


def grouped_ols(
    rows: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS fit of ``y = a + b·x`` from exact cent moments;
    ``x_col``/``y_col`` must already be BIGINT cents.  Returns
    ``(group_col, n, slope, intercept, r2)``."""
    m = (
        rows.select(
            group_col,
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        )
    )
    return m.select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        F.expr(_SLOPE).alias("slope"),
        F.expr(_INTERCEPT).alias("intercept"),
        F.expr(_R2).alias("r2"),
    )


@query("brand_price_quantity_ols", oracle=_OLS_ORACLE, bench=True)
def brand_price_quantity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of extended price (dollars) on quantity (units):
    slope = marginal dollars per unit, intercept in dollars, and the
    fit's R² — computed from exact integer cent moments in one grouped
    pass over lineitem⋈part."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col(_X) * 100).cast("bigint").alias("x"),
        F.round(F.col(_Y) * 100).cast("bigint").alias("y"),
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select("p_brand", "x", "y")
    return grouped_ols(joined, "p_brand", "x", "y")
