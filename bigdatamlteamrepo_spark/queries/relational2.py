"""TPC-H completion tier: the remaining canonical query shapes the
driver schema can express (the schema omits ``partsupp``, line commit/
receipt dates, ship modes, phones, containers and comments — each query
below states its adaptation).

Together with queries/relational.py this closes the classic 22-query
relational surface: the three shapes that reference ``partsupp``
price/cost columns are adapted — q9 substitutes a retail-price-derived
unit cost, q11 uses shipped value as the stock-value proxy, q20 turns
the excess-availqty predicate into a dominant-share predicate — each
keeping the original's plan shape (scalar-subquery threshold,
decorrelated per-group threshold join, semi-filters).

Scale notes (100 TB stance):
  * every query here keeps the fact tables on the shuffle-join path and
    only hints broadcast for the policy-listed bounded dims
    (catalog.maybe_broadcast);
  * the q21 EXISTS / NOT-EXISTS pair is decorrelated into ONE per-order
    aggregate (distinct suppliers, distinct late suppliers) — the naive
    correlated form would walk lineitem three times and self-join
    per-row; the aggregate form is two shuffles on l_orderkey total;
  * scalar subqueries (q15 max, q22 avg) become single-row aggregates
    cross-joined back in (Spark broadcasts a 1-row side automatically);
  * ratio queries (q8, q14) compute numerator and denominator as exact
    decimal sums in ONE aggregation pass (conditional sum), then divide
    once in double — deterministic for the value-hash gate, and no
    second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table, maybe_broadcast
from bigdatamlteamrepo_spark.functions.numeric import dec
from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.queries.relational import _REV_SQL, _rev

# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + pushed range filters + one
# global aggregate.  No join, no groupBy key: the partial aggregate
# collapses each partition to one row, so the shuffle moves O(partitions)
# bytes.  The three filters (date range, discount band, quantity cap) all
# push to the parquet scan.
# --------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                     * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 16, 2) * dec("l_discount", 8, 6))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q8 — national market share: 5-table join tree, year extraction, and a
# conditional-sum ratio.  Both sides of the ratio come out of ONE
# aggregation pass; the region/nation dims broadcast, customer/supplier
# ride AQE, and the two fact joins shuffle on orderkey/partkey.
# --------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"
_Q8_NATION = "NATION_2"


@query(
    "q8_market_share",
    oracle=f"""
WITH hits AS (
  SELECT year(o_orderdate) AS o_year, {_REV_SQL} AS volume, n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n2.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume
                          ELSE CAST(0 AS DECIMAL(25,8)) END) AS DECIMAL(38,8)) AS DOUBLE)
       / CAST(CAST(SUM(volume) AS DECIMAL(38,8)) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_items
FROM hits GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    # customer side: nations of the target region only (dim-side pruning
    # BEFORE the fact join — the region filter never touches lineitem)
    cust_nations = nation.join(
        maybe_broadcast(region, "region"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            maybe_broadcast(cust_nations, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            maybe_broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("supp_nation")),
                "nation",
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(25,8)")
    hits = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(maybe_broadcast(supp, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    return hits.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume")).otherwise(zero))
            .cast("decimal(38,8)")
            .cast("double")
            / F.sum("volume").cast("decimal(38,8)").cast("double")
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit.  The driver schema has no partsupp, so unit
# cost is modeled as 60% of p_retailprice (exact decimal arithmetic);
# the plan — part-name LIKE filter driving a 4-table join, profit per
# (supplier nation, order year) — is TPC-H q9's.
# --------------------------------------------------------------------------

_Q9_AMOUNT_SQL = (
    f"{_REV_SQL} - CAST(0.6 AS DECIMAL(2,1)) "
    "* CAST(p_retailprice AS DECIMAL(16,2)) * CAST(l_quantity AS DECIMAL(12,2))"
)


@query(
    "q9_product_profit",
    oracle=f"""
SELECT nation, o_year,
       CAST(CAST(SUM(amount) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         {_Q9_AMOUNT_SQL} AS amount
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%bolt%'
)
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            maybe_broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                ),
                "nation",
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = _rev() - (
        F.lit("0.6").cast("decimal(2,1)")
        * dec("p_retailprice", 16, 2)
        * dec("l_quantity", 12, 2)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("decimal(38,4)").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: one-quarter window, returnflag filter on
# the fact, revenue per customer, deterministic top-20.  The l_returnflag
# filter pushes to the lineitem scan BEFORE the join.
# --------------------------------------------------------------------------


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(nation, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_rev()).cast("decimal(38,4)").cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12 — late-shipment priority classes.  The driver schema has no ship
# mode or commit/receipt dates, so "late" is shipdate > orderdate + 90
# days and the grouping key is l_linestatus; the conditional-count CASE
# pair over a fact-fact join is exactly q12's plan.
# --------------------------------------------------------------------------

_HIGH_PRI = ("1-URGENT", "2-HIGH")


@query(
    "q12_late_shipment_priority",
    oracle=f"""
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('{_HIGH_PRI[0]}','{_HIGH_PRI[1]}')) AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('{_HIGH_PRI[0]}','{_HIGH_PRI[1]}')) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin(*_HIGH_PRI)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join with an extra
# join-condition predicate (NOT a WHERE — customers with only excluded
# orders must survive with count 0), then a two-level aggregate.
# --------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q14 — promotion revenue share: one-month window, part-type conditional
# ratio out of a single aggregation pass.  Division order matches the
# oracle exactly ((100 * num) / den) so the double is bit-identical.
# --------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT CAST(100.0 AS DOUBLE)
       * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                            ELSE CAST(0 AS DECIMAL(25,8)) END) AS DECIMAL(38,8)) AS DOUBLE)
       / CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS DOUBLE) AS promo_revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    zero = F.lit(0).cast("decimal(25,8)")
    joined = li.join(maybe_broadcast(part, "part"), F.col("l_partkey") == F.col("p_partkey"))
    num = (
        F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero))
        .cast("decimal(38,8)")
        .cast("double")
    )
    den = F.sum(_rev()).cast("decimal(38,8)").cast("double")
    return joined.agg(
        ((F.lit(100.0) * num) / den).alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: quarterly per-supplier revenue, then the rows whose
# revenue equals the global max (scalar subquery).  The revenue aggregate
# output is bounded by |supplier|, so the 1-row max side cross-joins back
# as an automatic broadcast; double equality is safe because both sides
# of the comparison come from the same exact-decimal pipeline.
# --------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("decimal(38,4)").cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(maybe_broadcast(supp, "supplier"), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity revenue: OR-of-ANDs predicate
# spanning both join sides.  The per-side prunable parts (brand∈set,
# size≥1, quantity bands' envelope) still push to the scans; the full
# disjunction evaluates post-join in codegen.
# --------------------------------------------------------------------------

_Q19_ARMS = (
    ("Brand#12", 15, (1, 21)),
    ("Brand#23", 25, (10, 30)),
    ("Brand#4", 35, (20, 40)),
)


def _q19_arm_sql(brand: str, max_size: int, qty: tuple[int, int]) -> str:
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN 1 AND {max_size} "
        f"AND l_quantity BETWEEN {qty[0]} AND {qty[1]})"
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {' OR '.join(_q19_arm_sql(*arm) for arm in _Q19_ARMS)}
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    arms = [
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, max_size)
        & F.col("l_quantity").between(*qty)
        for brand, max_size, qty in _Q19_ARMS
    ]
    pred = arms[0] | arms[1] | arms[2]
    return (
        li.join(maybe_broadcast(part, "part"), F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg(
            F.sum(_rev()).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: the classic correlated
# EXISTS ("another supplier contributed") + NOT EXISTS ("no OTHER
# supplier was late") pair, adapted to shipdate-vs-orderdate lateness.
# Decorrelated: ONE per-order aggregate computes (distinct suppliers,
# distinct late suppliers); a late line then "waits" iff the order is
# multi-supplier AND its only late supplier is this line's.  Two
# shuffles on l_orderkey replace three correlated lineitem walks.
# --------------------------------------------------------------------------

_LATE = "INTERVAL 90 DAY"


@query(
    "q21_waiting_suppliers",
    oracle=f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + {_LATE}
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + {_LATE}
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(_LATE)
    # one pass over (order ⋈ lines): distinct suppliers + distinct late
    # suppliers + the late supplier's id (valid when n_late_supp == 1)
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late", late
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    waiting = (
        lines.filter(F.col("is_late"))
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("agg_orderkey"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(maybe_broadcast(supp, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity: substring-derived country code, scalar
# AVG subquery (positive balances), and an anti-join.  The driver data
# gives every customer at least one order, so the anti condition is "no
# URGENT order" to stay non-vacuous; the plan (filtered dim → 1-row
# aggregate broadcast → anti-join → grouped sum) is exactly q22's.
# --------------------------------------------------------------------------

_Q22_CODES = ("13", "31", "23", "29", "30", "18", "17")


@query(
    "q22_sales_opportunity",
    oracle=f"""
WITH eligible AS (
  SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE substring(c_name, length(c_name) - 1, 2) IN {_Q22_CODES!r}
),
thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM eligible WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
FROM eligible, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY cntrycode
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.expr("substring(c_name, length(c_name) - 1, 2)")
    )
    eligible = cust.filter(F.col("cntrycode").isin(*_Q22_CODES)).select(
        "cntrycode", "c_acctbal", "c_custkey"
    )
    thresh = (
        eligible.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal", 30, 2)).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        eligible.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", 30, 2)).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification, adapted (the driver schema has no
# partsupp, so "stock value" is the shipped value SUM(extendedprice ×
# quantity) per part for suppliers of one nation — same shape: two-key
# agg, scalar-subquery threshold over the SAME aggregate, filter, sort).
# Scale: the supply agg shuffles on l_partkey once; the threshold is a
# 1-row aggregate broadcast back (Spark auto-broadcasts single-row
# sides); nation/supplier joins hint only the bounded dim.
# Threshold comparison stays deterministic cross-engine: both sides are
# exact decimal sums cast to double, then one IEEE multiply by 0.001.
# --------------------------------------------------------------------------


@query(
    "q11_important_stock",
    oracle="""
WITH supply AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(16,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT p_partkey, CAST(v AS DOUBLE) AS part_value
FROM supply, (SELECT CAST(SUM(v) AS DOUBLE) AS t FROM supply)
WHERE CAST(v AS DOUBLE) > t * 0.001
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = maybe_broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7"),
        "nation",
    )
    supply = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(dec("l_extendedprice", 16, 2) * dec("l_quantity", 12, 2)).alias("v")
        )
    )
    thresh = supply.agg(F.sum("v").cast("double").alias("t"))
    return (
        supply.crossJoin(F.broadcast(thresh))
        .filter(F.col("v").cast("double") > F.col("t") * 0.001)
        .select("p_partkey", F.col("v").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion, adapted (no partsupp availqty, so the
# "excess stock" predicate becomes a dominant-share predicate: suppliers
# who shipped > 50% of a 'red%'-named part's 1995 volume).  Shape kept:
# part-name semi-filter, per-(part, supplier) aggregate vs a correlated
# per-part threshold — decorrelated into one grouped agg joined back, the
# q21-style rewrite that avoids walking lineitem twice per row.
# --------------------------------------------------------------------------


@query(
    "q20_dominant_supplier",
    oracle="""
WITH qty AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS pk, SUM(q) AS total FROM qty GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM qty
JOIN tot ON l_partkey = pk
JOIN supplier ON s_suppkey = l_suppkey
WHERE CAST(q AS DOUBLE) > CAST(total AS DOUBLE) * 0.5
""",
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sup = load_table(spark, sf_dir, "supplier")
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("q"))
    )
    tot = qty.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("q").alias("total"))
    return (
        qty.join(tot, qty.l_partkey == tot.pk)
        .filter(F.col("q").cast("double") > F.col("total").cast("double") * 0.5)
        .join(sup, qty.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )
