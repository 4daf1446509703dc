"""Skyline / Pareto-frontier query over the part catalog.

The multi-criteria shortlist operator (Börzsönyi, Kossmann & Stocker
2001, "The Skyline Operator"): return every part NOT dominated on
(lower retail price, larger size) — a part is dominated when another
is at least as good on both axes and strictly better on one.

The textbook evaluation is the all-pairs NOT EXISTS — quadratic, and
exactly what the DuckDB oracle runs (an INDEPENDENT implementation, so
parity is a real cross-check, not the same plan twice).  The Spark
plan instead uses the 2-D monotone structure: group to one row per
distinct price, take TWO running maxima of size over the price order —
``A`` over strictly cheaper prices, ``B`` including the current price —
and a part is dominated iff ``A ≥ size`` (someone strictly cheaper is
at least as big) OR ``B > size`` (someone no more expensive is strictly
bigger).  Ties on both axes dominate nobody (no strict edge), so
duplicate frontier points all survive — the standard skyline
convention, and the NOT EXISTS agrees by construction.

Scale shape: one map-side-combinable groupBy to |distinct prices|
rows, one window over that reduced frame (single-column sort of the
price domain, NOT the part table), one hash join back.  O(n) + a sort
of the distinct-value frame vs the oracle's O(n²) — this face is the
repo's template for trading dominance checks against monotone prefix
state instead of pair joins.

Number discipline: prices become exact BIGINT cents via the
DECIMAL(12,2) cast; sizes are already integers — dominance never
compares floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: exact integer cents from the stored double (RFM monetary idiom)
_PRICE_CENTS = "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"

_SKYLINE_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, p_brand, {_PRICE_CENTS} AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT a.p_partkey, a.p_brand, a.price_cents, a.size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
    AND (b.price_cents < a.price_cents OR b.size > a.size)
)
"""


def skyline_2d(points: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``points`` not dominated on (lower ``minimize``, higher
    ``maximize``).  Both columns must be exact (integer/decimal) types —
    dominance on floats is a cross-engine hazard by construction."""
    per_x = points.groupBy(minimize).agg(F.max(maximize).alias("__mx"))
    w_strict = (
        Window.orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = per_x.select(
        minimize,
        # A: best maximize among STRICTLY cheaper; B: including ties
        F.max("__mx").over(w_strict).alias("__a"),
        "__mx",
    )
    return (
        points.join(dom, minimize)
        .filter(
            ~(
                F.coalesce(F.col("__a") >= F.col(maximize), F.lit(False))
                | (F.col("__mx") > F.col(maximize))
            )
        )
        .drop("__a", "__mx")
    )


@query("part_pareto_frontier", oracle=_SKYLINE_ORACLE)
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (cheapest, largest) Pareto frontier — the
    shortlist no buyer criterion mixing price and size can skip."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.expr(_PRICE_CENTS).alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return skyline_2d(p, minimize="price_cents", maximize="size")
