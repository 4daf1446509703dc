"""Forecast backtesting: seasonal-naive hourly-volume prediction with
an integer-exact error report.

The capacity-planning workload every event platform runs (Hyndman &
Athanasopoulos, *Forecasting: Principles and Practice* — the
seasonal-naive baseline every fancier model must beat): train on the
first part of the stream, predict each test hour's event count per
type from the hour-of-day profile, and report MAE / bias per type
against the global-mean naive — the skill comparison that says whether
seasonality is real signal.

Number discipline: predictions are half-away micro-unit rationals of
exact integer counts (train totals ÷ calendar day count), actuals are
exact counts on a DENSE hour spine (hours with zero events are rows,
not gaps — the silent omission that flatters MAE), and both error
metrics are half-away means of integer absolute/signed differences —
BIGINT end to end.

Scale shape: ONE pass over train (map-side-combinable (type, hod)
cells) + ONE pass over test; the spine is |types| × test-hours rows
built from a ``sequence`` literal, joined to actuals by hash — no
per-hour driver loop, no window over the raw stream.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

MICRO = 1_000_000
#: train/test split: train = Jan 1–23, test = Jan 24–30 (7 full days)
TEST_START = "2024-01-24 00:00:00"
TEST_END = "2024-01-31 00:00:00"
#: calendar days in the train window (Jan 1 .. Jan 23)
TRAIN_DAYS = 23

_FC_ORACLE = f"""
WITH train AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS c
  FROM events
  WHERE ts < TIMESTAMP '{TEST_START}'
  GROUP BY 1, 2
),
model AS (
  SELECT event_type, hod,
         CAST((2 * c * {MICRO} + {TRAIN_DAYS}) // (2 * {TRAIN_DAYS})
              AS BIGINT) AS pred_micro
  FROM train
),
gmodel AS (
  SELECT event_type,
         CAST((2 * SUM(c) * {MICRO} + {TRAIN_DAYS} * 24)
              // (2 * {TRAIN_DAYS} * 24) AS BIGINT) AS gpred_micro
  FROM train GROUP BY event_type
),
spine AS (
  SELECT t.event_type, h.hour_ts,
         EXTRACT(hour FROM h.hour_ts) AS hod
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '{TEST_START}',
                                  TIMESTAMP '{TEST_END}' - INTERVAL 1 HOUR,
                                  INTERVAL 1 HOUR)) AS hour_ts
  ) h
),
actual AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS a
  FROM events
  WHERE ts >= TIMESTAMP '{TEST_START}' AND ts < TIMESTAMP '{TEST_END}'
  GROUP BY 1, 2
),
cells AS (
  SELECT s.event_type,
         COALESCE(a.a, 0) * {MICRO} AS actual_micro,
         COALESCE(m.pred_micro, 0) AS pred_micro,
         g.gpred_micro
  FROM spine s
  LEFT JOIN actual a ON s.event_type = a.event_type AND s.hour_ts = a.hour_ts
  LEFT JOIN model m ON s.event_type = m.event_type AND s.hod = m.hod
  JOIN gmodel g ON s.event_type = g.event_type
)
SELECT event_type,
       COUNT(*) AS n_test_hours,
       CAST((2 * SUM(ABS(actual_micro - pred_micro)) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS mae_micro,
       CAST((2 * SUM(ABS(actual_micro - gpred_micro)) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS naive_mae_micro,
       -- signed half-away mean: both engines truncate integer division
       -- toward zero (DuckDB -7 // 2 = -3, same as Spark div), so the
       -- sign-split is NOT an engine-reconciliation trick — it turns the
       -- rounding for negative sums from half-up into half-away-from-zero
       CAST(CASE WHEN SUM(actual_micro - pred_micro) >= 0
                 THEN (2 * SUM(actual_micro - pred_micro) + COUNT(*))
                      // (2 * COUNT(*))
                 ELSE -((2 * -SUM(actual_micro - pred_micro) + COUNT(*))
                        // (2 * COUNT(*))) END AS BIGINT) AS bias_micro
FROM cells GROUP BY event_type
"""


@query("events_hourly_forecast_backtest", oracle=_FC_ORACLE)
def events_hourly_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest of hourly event counts per type: train
    Jan 1–23, predict each of the 168 test hours (Jan 24–30) from the
    hour-of-day profile, and report MAE, the global-mean naive MAE
    (the skill baseline), and signed bias — all half-away micro units
    over a dense zero-filled hour spine."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    t0 = F.lit(TEST_START).cast("timestamp")
    t1 = F.lit(TEST_END).cast("timestamp")

    train = (
        ev.filter(F.col("ts") < t0)
        .groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model = train.select(
        "event_type",
        "hod",
        F.expr(
            f"CAST((2 * c * {MICRO} + {TRAIN_DAYS}) div (2 * {TRAIN_DAYS})"
            " AS BIGINT)"
        ).alias("pred_micro"),
    )
    gmodel = train.groupBy("event_type").agg(
        F.expr(
            f"CAST((2 * SUM(c) * {MICRO} + {TRAIN_DAYS} * 24)"
            f" div (2 * {TRAIN_DAYS} * 24) AS BIGINT)"
        ).alias("gpred_micro")
    )

    n_hours = int(
        (dt.datetime.fromisoformat(TEST_END) - dt.datetime.fromisoformat(TEST_START))
        .total_seconds() // 3600
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.expr(
                    f"sequence(TIMESTAMP '{TEST_START}',"
                    f" TIMESTAMP '{TEST_END}' - INTERVAL 1 HOUR,"
                    " INTERVAL 1 HOUR)"
                )
            ).alias("hour_ts"),
        )
        .withColumn("hod", F.hour("hour_ts"))
    )
    assert n_hours == 168  # 7 full days — documents the spine size

    actual = (
        ev.filter((F.col("ts") >= t0) & (F.col("ts") < t1))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count(F.lit(1)).alias("a"))
    )
    cells = (
        spine.join(actual, ["event_type", "hour_ts"], "left")
        .join(model, ["event_type", "hod"], "left")
        .join(F.broadcast(gmodel), "event_type")
        .select(
            "event_type",
            (F.coalesce(F.col("a"), F.lit(0)) * MICRO).alias("actual_micro"),
            F.coalesce("pred_micro", F.lit(0)).alias("pred_micro"),
            "gpred_micro",
        )
    )
    return cells.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test_hours"),
        F.expr(
            "CAST((2 * SUM(ABS(actual_micro - pred_micro)) + COUNT(*))"
            " div (2 * COUNT(*)) AS BIGINT)"
        ).alias("mae_micro"),
        F.expr(
            "CAST((2 * SUM(ABS(actual_micro - gpred_micro)) + COUNT(*))"
            " div (2 * COUNT(*)) AS BIGINT)"
        ).alias("naive_mae_micro"),
        F.expr(
            "CAST(CASE WHEN SUM(actual_micro - pred_micro) >= 0"
            " THEN (2 * SUM(actual_micro - pred_micro) + COUNT(*))"
            " div (2 * COUNT(*))"
            " ELSE -((2 * -SUM(actual_micro - pred_micro) + COUNT(*))"
            " div (2 * COUNT(*))) END AS BIGINT)"
        ).alias("bias_micro"),
    )
