"""Exact weighted median: the robust center where each row counts by a
weight, not once.

Revenue/inventory analytics ask "the price at which half the QUANTITY
trades" — the quantity-weighted median — not the row median an
``approx_percentile``/``median`` call gives.  Spark has no weighted
percentile; the distributed-exact form is classic selection over
cumulative weights (lower weighted median: the smallest value v with
2·W(≤v) ≥ W_total).

Scale shape: one hash join on partkey (dimension side broadcastable),
ONE map-side-combinable groupBy to |brand| × |distinct cents| cells, a
running weight sum over each brand's price domain (bounded by the cent
domain, never by lineitem count), and a min-filter.  No global sort of
fact rows, no per-group collect.

Number discipline: prices are exact DECIMAL(12,2)-cast cents,
quantities are integral doubles cast to BIGINT, and the median
selection compares 2·cumw against the total — integers end to end, no
interpolation (the two-engine hazard exact selection exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

_WMEDIAN_ORACLE = """
WITH j AS (
  SELECT p.p_brand,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents,
         CAST(l.l_quantity AS BIGINT) AS w
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
g AS (
  SELECT p_brand, cents, SUM(w) AS w, COUNT(*) AS n
  FROM j GROUP BY 1, 2
),
c AS (
  SELECT p_brand, cents, n,
         SUM(w) OVER (PARTITION BY p_brand ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY p_brand) AS totw,
         SUM(n) OVER (PARTITION BY p_brand) AS totn
  FROM g
)
SELECT p_brand,
       CAST(MIN(totn) AS BIGINT) AS n_lineitems,
       CAST(MIN(totw) AS BIGINT) AS total_qty,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
         AS wmedian_price_cents
FROM c GROUP BY p_brand
"""


class NegativeWeightError(ValueError):
    """A weight below zero reached :func:`weighted_median` — the
    cumulative selection is only correct over non-negative weights
    (raised only under ``validate=True``)."""


def weighted_median(
    df: DataFrame, group: str, value: str, weight: str,
    validate: bool = False,
) -> DataFrame:
    """Lower weighted median of integer ``value`` by ``weight`` per
    ``group`` → ``(group, total_weight, wmedian)``: smallest v with
    2·W(≤v) ≥ W_total.

    Weights must be POSITIVE: a zero weight is harmless noise, but a
    negative one breaks the monotonicity of the cumulative selection
    (the defining inequality can then hold at a value below the true
    median).  The registered face feeds l_quantity ≥ 1 and keeps the
    default; generic callers can pass ``validate=True`` to turn the
    precondition into a fail-fast :class:`NegativeWeightError` at the
    cost of ONE scalar min-aggregate over the input (the house
    eager-guard contract — same discipline as
    ``operators/setjoin.CandidateVolumeExceeded``)."""
    if validate:
        wmin = df.agg(F.min(weight).alias("m")).collect()[0]["m"]
        if wmin is not None and wmin < 0:
            raise NegativeWeightError(
                f"weighted_median requires non-negative weights; "
                f"min({weight}) = {wmin}"
            )
    g = df.groupBy(group, value).agg(F.sum(weight).alias("w"))
    cum_w = (
        Window.partitionBy(group)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(group)
    c = g.select(
        group,
        F.col(value),
        F.sum("w").over(cum_w).alias("cumw"),
        F.sum("w").over(tot_w).alias("totw"),
    )
    return c.groupBy(group).agg(
        F.min("totw").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cumw") >= F.col("totw"), F.col(value))
        ).alias("wmedian"),
    )


@query("brand_weighted_median_price", oracle=_WMEDIAN_ORACLE)
def brand_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand quantity-weighted median line price: the cent price at
    which half the shipped quantity is cheaper — each line votes with
    its l_quantity, so a 50-unit line outweighs fifty 1-unit rows the
    plain median counts equally."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", "cents", "w"
    )
    wm = weighted_median(j, group="p_brand", value="cents", weight="w")
    n = j.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_lineitems"))
    return wm.join(n, "p_brand").select(
        "p_brand",
        "n_lineitems",
        F.col("total_weight").alias("total_qty"),
        F.col("wmedian").alias("wmedian_price_cents"),
    )
