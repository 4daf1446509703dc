"""Market-data-style downsampling of the event stream: OHLC bars and
time-weighted averages (TWAP).

The tick-to-bar aggregation every financial/metrics store runs
(kdb+/InfluxDB/TimescaleDB ``first/last/min/max`` rollups): compress
the per-event ``value`` series into per-hour OHLC candles, and compute
the duration-weighted mean that is robust to burst sampling — an event
that holds a value for an hour must count more than fifty ticks inside
one second (the classic TWAP/VWAP distinction vs the plain mean).

Number discipline: ``value`` doubles become exact BIGINT cents via the
``DECIMAL(12,2)`` cast (the RFM monetary idiom — both engines agree on
every stored double), durations are exact epoch microseconds, and the
TWAP rational runs in DECIMAL(38,0) / HUGEINT before the half-away
division (the baskets-lift idiom).

Scale shape:

* OHLC is ONE map-side-combinable groupBy — ``min_by/max_by`` over a
  ``(ts, event_id)`` struct are ordinary semigroup aggregates, so the
  shuffle carries |types| × |hours| cells, never ticks.
* TWAP needs consecutive-event gaps — a window.  The oracle uses the
  obvious one-partition-per-type ``lead``; the Spark plan instead
  DECOMPOSES by calendar day: within-day gaps window over
  ``(type, day)`` partitions (bounded by a day's ticks — the
  partition-count fix for the 5-type stream at 100 TB) and the
  day-boundary segments come from a per-day aggregate frame (≤ |days|
  rows per type) windowed separately.  Two different plans, identical
  exact segment sets — the parity check crosses real plan diversity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale for TWAP/mean outputs (micro-cents)
MICRO = 1_000_000

#: exact integer cents from the stored double (RFM monetary idiom)
_CENTS_SQL = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"


_OHLC_ORACLE = f"""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, ts, event_id,
         {_CENTS_SQL} AS cents
  FROM events
)
SELECT event_type, hour_ts,
       CAST(first(cents ORDER BY ts, event_id) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(last(cents ORDER BY ts, event_id) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       CAST(SUM(cents) AS BIGINT) AS volume_cents
FROM e GROUP BY 1, 2
"""


@query("events_value_ohlc_hourly", oracle=_OHLC_ORACLE, bench=True)
def events_value_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event type: open/close are the values at
    the first/last tick of the hour (``(ts, event_id)`` total order —
    deterministic under timestamp ties), high/low/volume the extremes
    and cent sum.  One shuffle of |types| × |hours| cells; open/close
    ride the same hash aggregate as ``min_by/max_by`` (no window, no
    per-hour sort of the raw stream)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.struct("ts", "event_id").alias("tick"),
        F.expr(_CENTS_SQL).alias("cents"),
    )
    return ev.groupBy("event_type", "hour_ts").agg(
        F.min_by("cents", "tick").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "tick").alias("close_cents"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("cents").alias("volume_cents"),
    )


_TWAP_ORACLE = f"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS tus, {_CENTS_SQL} AS cents
  FROM events
),
seg AS (
  SELECT event_type, cents,
         lead(tus) OVER (PARTITION BY event_type ORDER BY tus, event_id)
           - tus AS dt_us
  FROM e
)
SELECT event_type,
       CAST(COUNT(dt_us) AS BIGINT) AS n_segments,
       CAST(SUM(dt_us) AS BIGINT) AS total_dt_us,
       CAST((2 * CAST(SUM(cents * dt_us) AS HUGEINT) * {MICRO}
              + SUM(dt_us))
            // (2 * CAST(SUM(dt_us) AS HUGEINT)) AS BIGINT)
         AS twap_microcents,
       CAST((2 * CAST(SUM(cents) AS HUGEINT) * {MICRO} + COUNT(*))
            // (2 * CAST(COUNT(*) AS HUGEINT)) AS BIGINT)
         AS mean_microcents
FROM seg WHERE dt_us IS NOT NULL
GROUP BY event_type
"""


@query("events_value_twap", oracle=_TWAP_ORACLE, bench=True)
def events_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type: each tick's value is
    weighted by the exact microseconds until the NEXT tick of that type
    (the final tick carries no weight — the standard left-closed TWAP
    segment convention), reported next to the unweighted mean over the
    SAME segment sample — duration weighting is then the ONLY
    difference between the two columns, so their gap isolates the
    burst-sampling bias.

    The oracle computes gaps with one ``lead`` over a per-type
    partition; at 100 TB a 5-type stream would sort each type on a
    single task, so the Spark plan decomposes by day instead:

    * within-day gaps: window over ``(type, day)`` — thousands of
      bounded partitions;
    * day-boundary gaps: one per-day aggregate row ``(first tick ts,
      last tick cents)`` per ``(type, day)``, then a ``lead`` over the
      ≤|days|-row per-type day frame.

    Days with no ticks for a type collapse automatically: the day
    frame's ``lead`` skips to the next day WITH ticks, so the boundary
    segment spans the true gap and the two plans produce the identical
    exact segment multiset."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", F.expr(_CENTS_SQL).alias("cents")
    )
    return twap_by_type(ev)


def twap_by_type(ticks: DataFrame) -> DataFrame:
    """Day-decomposed TWAP over ``(event_type, event_id, ts, cents)``
    ticks (see :func:`events_value_twap` for the plan rationale);
    exposed separately so tests can feed hand streams and brute-force
    the global-segment definition against this decomposition."""
    ev = ticks.select(
        "event_type",
        "event_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("tus"),
        "cents",
    )
    in_day = Window.partitionBy("event_type", "day").orderBy("tus", "event_id")
    within = (
        ev.withColumn("dt_us", F.lead("tus").over(in_day) - F.col("tus"))
        .filter(F.col("dt_us").isNotNull())
        .select("event_type", "cents", "dt_us")
    )
    day_frame = ev.groupBy("event_type", "day").agg(
        F.min("tus").alias("first_tus"),
        F.max("tus").alias("last_tus"),
        F.max_by("cents", F.struct("tus", "event_id")).alias("last_cents"),
    )
    across = Window.partitionBy("event_type").orderBy("day")
    boundary = (
        day_frame.withColumn(
            "dt_us", F.lead("first_tus").over(across) - F.col("last_tus")
        )
        .filter(F.col("dt_us").isNotNull())
        .select("event_type", F.col("last_cents").alias("cents"), "dt_us")
    )
    return (
        within.unionByName(boundary)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_us").alias("total_dt_us"),
            F.expr(
                f"CAST((2 * CAST(SUM(cents * dt_us) AS DECIMAL(38,0)) * {MICRO}"
                "  + SUM(dt_us))"
                " DIV (2 * CAST(SUM(dt_us) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("twap_microcents"),
            F.expr(
                f"CAST((2 * CAST(SUM(cents) AS DECIMAL(38,0)) * {MICRO}"
                " + COUNT(*))"
                " DIV (2 * CAST(COUNT(*) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("mean_microcents"),
        )
    )
