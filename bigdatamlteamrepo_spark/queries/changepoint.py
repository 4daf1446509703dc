"""Changepoint detection: two-sided CUSUM over daily event volumes.

The drift monitor every streaming platform bolts onto its pipelines
(Page 1954, "Continuous Inspection Schemes"): accumulate deviations of
the daily count from a trained reference mean and alarm when the
accumulation crosses a threshold — catches small persistent shifts
that per-day outlier rules (the MAD face) miss by construction.

The recursion S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) looks inherently
sequential, but the clamp has a closed prefix form

    S⁺_t = P_t − min(0, min_{j ≤ t} P_j),   P_t = Σ_{i ≤ t} (x_i − μ − k)

so both engines compute it as TWO stock window passes (running sum,
running min) over the per-day aggregate — no recursive CTE, no UDF,
no per-row loop.  Downward shifts mirror with x → −x.

Number discipline: daily counts are exact integers on a DENSE day
spine (a silent zero-event day IS the shift the lower CUSUM must see),
μ is a half-away micro mean of the train days, and the allowance
k = μ/20 and threshold h = μ/4 are integer-derived from μ — BIGINT end
to end, no parameter ever passes through a float.

Scale shape: ONE map-side-combinable (type, day) count of the raw
stream; every window after that runs over |types| × |days| rows —
monitoring state is calendar-sized, never event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale for the CUSUM statistics
MICRO = 1_000_000
#: calendar window of the stream and the train/monitor split
DAY_FIRST = "2024-01-01"
DAY_LAST = "2024-01-30"
TRAIN_END = "2024-01-14"  # inclusive: train = Jan 1–14, monitor = Jan 15–30
TRAIN_DAYS = 14
#: allowance k = μ/den_k (slack per day), threshold h = μ/den_h
DEN_K = 20
DEN_H = 4

_CUSUM_ORACLE = f"""
WITH spine AS (
  SELECT t.event_type, CAST(d.d AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(DATE '{DAY_FIRST}',
                                            DATE '{DAY_LAST}',
                                            INTERVAL 1 DAY)) AS d) d
),
daily AS (
  SELECT s.event_type, s.day, COALESCE(c.c, 0) AS c
  FROM spine s LEFT JOIN (
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
    FROM events GROUP BY 1, 2
  ) c ON s.event_type = c.event_type AND s.day = c.day
),
mu AS (
  SELECT event_type,
         CAST((2 * SUM(c) * {MICRO} + {TRAIN_DAYS})
              // (2 * {TRAIN_DAYS}) AS BIGINT) AS mu_micro
  FROM daily WHERE day <= DATE '{TRAIN_END}' GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day,
         d.c * {MICRO} - m.mu_micro - m.mu_micro // {DEN_K} AS up,
         m.mu_micro - d.c * {MICRO} - m.mu_micro // {DEN_K} AS dn,
         m.mu_micro // {DEN_H} AS h
  FROM daily d JOIN mu m USING (event_type)
  WHERE d.day > DATE '{TRAIN_END}'
),
pre AS (
  SELECT event_type, day, h,
         SUM(up) OVER w AS pu, SUM(dn) OVER w AS pd
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT event_type, day, h,
         pu - LEAST(0, MIN(pu) OVER w) AS s_plus,
         pd - LEAST(0, MIN(pd) OVER w) AS s_minus
  FROM pre
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_monitor_days,
       ANY_VALUE(h) AS h_micro,
       CAST(MAX(s_plus) AS BIGINT) AS s_plus_max,
       CAST(MAX(s_minus) AS BIGINT) AS s_minus_max,
       -- TIMESTAMP output: duckdb's pandas bridge maps DATE to
       -- datetime64 anyway, so emit the type both engines agree on
       CAST(MIN(CASE WHEN s_plus > h THEN day END)
            AS TIMESTAMP) AS first_up_alarm,
       CAST(MIN(CASE WHEN s_minus > h THEN day END)
            AS TIMESTAMP) AS first_down_alarm,
       CAST(SUM(CASE WHEN s_plus > h OR s_minus > h THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarm_days
FROM s GROUP BY event_type
"""


def two_sided_cusum(
    daily: DataFrame,
    train_end: str = TRAIN_END,
    train_days: int = TRAIN_DAYS,
) -> DataFrame:
    """Two-sided CUSUM over a dense ``(event_type, day, c)`` daily-count
    frame: train μ on days ≤ ``train_end`` (``train_days`` calendar
    days), monitor the rest with allowance k = μ/{DEN_K} and threshold
    h = μ/{DEN_H}; one summary row per type.  Exposed separately from
    the registered face so tests can feed hand streams with planted
    shifts."""
    mu = (
        daily.filter(F.col("day") <= F.lit(train_end).cast("date"))
        .groupBy("event_type")
        .agg(
            F.expr(
                f"CAST((2 * SUM(c) * {MICRO} + {train_days})"
                f" div (2 * {train_days}) AS BIGINT)"
            ).alias("mu_micro")
        )
    )
    dev = (
        daily.filter(F.col("day") > F.lit(train_end).cast("date"))
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            "day",
            F.expr(f"c * {MICRO} - mu_micro - mu_micro div {DEN_K}").alias("up"),
            F.expr(f"mu_micro - c * {MICRO} - mu_micro div {DEN_K}").alias("dn"),
            F.expr(f"mu_micro div {DEN_H}").alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = dev.select(
        "event_type",
        "day",
        "h",
        F.sum("up").over(w).alias("pu"),
        F.sum("dn").over(w).alias("pd"),
    )
    s = pre.select(
        "event_type",
        "day",
        "h",
        (F.col("pu") - F.least(F.lit(0), F.min("pu").over(w))).alias("s_plus"),
        (F.col("pd") - F.least(F.lit(0), F.min("pd").over(w))).alias("s_minus"),
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_monitor_days"),
        F.any_value("h").alias("h_micro"),
        F.max("s_plus").alias("s_plus_max"),
        F.max("s_minus").alias("s_minus_max"),
        F.min(F.when(F.col("s_plus") > F.col("h"), F.col("day")))
        .cast("timestamp")
        .alias("first_up_alarm"),
        F.min(F.when(F.col("s_minus") > F.col("h"), F.col("day")))
        .cast("timestamp")
        .alias("first_down_alarm"),
        F.sum(
            ((F.col("s_plus") > F.col("h")) | (F.col("s_minus") > F.col("h")))
            .cast("int")
        )
        .cast("bigint")
        .alias("n_alarm_days"),
    )


@query("events_cusum_changepoint", oracle=_CUSUM_ORACLE)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM monitor per event type: train μ on Jan 1–14,
    monitor Jan 15–30, alarm when either accumulated deviation exceeds
    h = μ/4 with allowance k = μ/20.  Emits the max statistics, first
    alarm dates (NULL = in control), and alarm-day count."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.expr(
                    f"sequence(DATE '{DAY_FIRST}', DATE '{DAY_LAST}',"
                    " INTERVAL 1 DAY)"
                )
            ).alias("day"),
        )
    )
    counts = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("c"))
    daily = spine.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    return two_sided_cusum(daily)
