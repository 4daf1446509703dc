"""Experimentation analytics: two-proportion A/B test + CUPED
variance reduction.

The online-experimentation workload (Kohavi et al., *Trustworthy Online
Controlled Experiments*; CUPED: Deng, Xu, Kohavi & Walker 2013,
"Improving the sensitivity of online controlled experiments by
utilizing pre-experiment data", WSDM) over the event stream: users are
deterministically hash-split into cohorts A/B (portable md5 parity —
the same bucketing a production assignment service does), and

* :func:`events_ab_test_purchase_rate` runs the classic two-proportion
  z-test on per-user purchase conversion, and
* :func:`events_cuped_adjusted_lift` adjusts the post-period value
  metric by the pre-period covariate (θ = cov(pre, post)/var(pre)),
  reporting the raw vs CUPED-adjusted cohort lift and the variance
  reduction ρ² — the sensitivity win that lets the same experiment
  detect an effect with (1 − ρ²)× the users.

Number discipline: conversions and per-user value sums are exact
integers (micro-quantized, DECIMAL(38,0)/HUGEINT group sums); every
derived statistic (rates, θ, z, ρ²) is ONE shared double expression
over the exact moments, rounded once — identical text in both engines.

Scale shape: each face is ONE scan → per-user conditional aggregation
(map-side combinable on user_id) → a constant-size moment reduction.
CUPED's adjusted MEANS need no per-row adjustment pass at all:
mean(y − θ(x − x̄)) per cohort = ȳ_c − θ(x̄_c − x̄), so the whole
adjustment folds into the moment frame — the algebra, not a second
shuffle, is the 100 TB optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale
MICRO = 1_000_000
#: pre/post split instant for the CUPED covariate
CUPED_SPLIT = "2024-01-16 00:00:00"

#: portable cohort assignment: md5-parity of the user id (same hash32
#: family as queries/shards.py)
_COHORT_SQL = (
    "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2)"
)
_COHORT_SPARK = (
    "pmod(cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)"
    " as bigint), 2)"
)

#: conversion = at least one HIGH-VALUE purchase (value > threshold);
#: the unconditional purchase rate is 1.0 on this corpus (every user
#: buys something) — a degenerate proportion with a zero-variance z
_CONV_THRESHOLD = 200

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         {_COHORT_SQL} AS cohort,
         MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_THRESHOLD}
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
m AS (
  SELECT SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN cohort = 0 THEN conv ELSE 0 END) AS conv_a,
         SUM(CASE WHEN cohort = 1 THEN conv ELSE 0 END) AS conv_b
  FROM u
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       CAST((2 * conv_a * {MICRO} + n_a) // (2 * n_a) AS BIGINT)
         AS rate_a_micro,
       CAST((2 * conv_b * {MICRO} + n_b) // (2 * n_b) AS BIGINT)
         AS rate_b_micro,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN NULL
            ELSE CAST(round(
         (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) * 1000) AS BIGINT) END AS z_milli
FROM m
"""


@query("events_ab_test_purchase_rate", oracle=_AB_ORACLE)
def events_ab_test_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of per-user HIGH-VALUE purchase conversion
    (≥1 purchase with value > threshold; the unconditional rate is a
    degenerate 1.0 here) between the md5-parity cohorts: cohort sizes,
    conversions, rates (micro) and the pooled z statistic (milli) —
    one scan, one per-user agg, one 1-row moment frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > _CONV_THRESHOLD),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).withColumn("cohort", F.expr(_COHORT_SPARK))
    m = u.agg(
        F.sum(F.expr("CASE WHEN cohort = 0 THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN 1 ELSE 0 END")).alias("n_b"),
        F.sum(F.expr("CASE WHEN cohort = 0 THEN conv ELSE 0 END")).alias("conv_a"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN conv ELSE 0 END")).alias("conv_b"),
    )
    return m.selectExpr(
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(conv_a AS BIGINT) AS conv_a",
        "CAST(conv_b AS BIGINT) AS conv_b",
        f"CAST((2 * conv_a * {MICRO} + n_a) div (2 * n_a) AS BIGINT)"
        " AS rate_a_micro",
        f"CAST((2 * conv_b * {MICRO} + n_b) div (2 * n_b) AS BIGINT)"
        " AS rate_b_micro",
        # degenerate pooled rate (0 or 1) → zero-variance test: NULL z
        # (identically guarded in the oracle; unguarded, ANSI Spark
        # raises DIVIDE_BY_ZERO and DuckDB rounds an inf)
        "CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b"
        " THEN NULL ELSE"
        " CAST(round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)"
        " / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
        " * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
        " * (1.0 / n_a + 1.0 / n_b)) * 1000) AS BIGINT) END AS z_milli",
    )


#: one shared double expression set over the exact CUPED moments —
#: n, sx, sy, sxx, sxy, syy (overall) and per-cohort n/sx/sy
_THETA = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_RHO2 = (
    "(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)
#: raw and CUPED-adjusted cohort lift (A − B), in micro units:
#: adj_mean_c = ȳ_c − θ(x̄_c − x̄)  ⇒  adj lift = (ȳa−ȳb) − θ(x̄a−x̄b)
_RAW_LIFT = (
    "(CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b)"
)
_ADJ_LIFT = (
    f"({_RAW_LIFT} - {_THETA}"
    " * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b))"
)

_CUPED_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         {_COHORT_SQL} AS cohort,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                       THEN CAST(round(value * {MICRO}) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                       THEN CAST(round(value * {MICRO}) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  -- per-user sums reach ~1e10 micro, so squares exceed int64: widen to
  -- HUGEINT BEFORE multiplying (Spark side mirrors with DECIMAL(38,0))
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN cohort = 0 THEN x ELSE 0 END) AS sx_a,
         SUM(CASE WHEN cohort = 1 THEN x ELSE 0 END) AS sx_b,
         SUM(CASE WHEN cohort = 0 THEN y ELSE 0 END) AS sy_a,
         SUM(CASE WHEN cohort = 1 THEN y ELSE 0 END) AS sy_b
  FROM u
)
SELECT CAST(n AS BIGINT) AS n_users,
       round({_THETA}, 6) AS theta,
       round({_RHO2}, 6) AS var_reduction,
       CAST(round({_RAW_LIFT}) AS BIGINT) AS raw_lift_micro,
       CAST(round({_ADJ_LIFT}) AS BIGINT) AS cuped_lift_micro
FROM m
"""


@query("events_cuped_adjusted_lift", oracle=_CUPED_ORACLE)
def events_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED: the A−B lift of per-user post-period value, raw vs
    adjusted by the pre-period covariate (θ from pooled exact moments),
    plus the variance reduction ρ² — the adjustment folds entirely into
    the moment frame (no per-row second pass)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.expr(f"CAST(round(value * {MICRO}) AS BIGINT)").alias("v"),
    )
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, F.col("v")).otherwise(F.lit(0)))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("ts") >= split, F.col("v")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
        )
        .withColumn("cohort", F.expr(_COHORT_SPARK))
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        # widen BEFORE multiplying: per-user sums are ~1e10 micro, so
        # bigint squares would wrap in non-ANSI Spark
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y")).alias("syy"),
        F.sum(F.expr("CASE WHEN cohort = 0 THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN 1 ELSE 0 END")).alias("n_b"),
        F.sum(F.expr("CASE WHEN cohort = 0 THEN x ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("sx_a"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN x ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("sx_b"),
        F.sum(F.expr("CASE WHEN cohort = 0 THEN y ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("sy_a"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN y ELSE 0 END"))
        .cast("decimal(38,0)")
        .alias("sy_b"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        f"round({_THETA}, 6) AS theta",
        f"round({_RHO2}, 6) AS var_reduction",
        f"CAST(round({_RAW_LIFT}) AS BIGINT) AS raw_lift_micro",
        f"CAST(round({_ADJ_LIFT}) AS BIGINT) AS cuped_lift_micro",
    )
