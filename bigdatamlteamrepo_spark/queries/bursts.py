"""Incident correlation: purchases inside error-burst windows, through
a real range join.

The ops question every event platform asks — "what happened to revenue
while errors were spiking?" — is an INTERVAL join: derive busy windows
from one stream, then join another stream by time containment.  The
windows here are maximal runs of above-average error hours (the
lag/running-sum island idiom shared with the passage span merger), and
the join runs through
:func:`~bigdatamlteamrepo_spark.operators.rangejoin.interval_point_join`
— binned equi-join + containment post-filter — while the DuckDB oracle
executes the textbook ``ts >= start AND ts < end`` nested-loop join:
parity across genuinely different join algorithms, which is the point.

Busy threshold is scale-free: an hour is busy when
``count · 720 > total`` (above the dense-spine Jan mean), so the face
is non-degenerate at every SF without a tuned literal.  All arithmetic
is integer (cent sums via the DECIMAL(12,2) idiom).

Scale shape: the island window runs over ≤ 720 busy-hour rows per
month; the interval side of the join explodes into a handful of 4-hour
bins; the purchase stream shuffles ONCE on its bin id.  Nothing driver
side except the operator's bounded volume guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.checkpoint import truncate
from bigdatamlteamrepo_spark.operators.rangejoin import (
    interval_overlap_join,
    interval_point_join,
)
from bigdatamlteamrepo_spark.queries.concurrency import GAP_SECONDS
from bigdatamlteamrepo_spark.queries.registry import query

#: hours in the January event window (dense spine; scale-free mean)
SPINE_HOURS = 720
#: bin width for the range join — 4 h, near the typical burst length
BIN_US = 4 * 3600 * 1_000_000

_BURST_ORACLE = """
WITH hc AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events WHERE event_type = 'error' GROUP BY 1
),
tot AS (SELECT SUM(c) AS t FROM hc),
busy AS (SELECT h FROM hc, tot WHERE c * 720 > t),
brk AS (
  SELECT h,
         CASE WHEN lag(h) OVER (ORDER BY h) = h - INTERVAL 1 HOUR
              THEN 0 ELSE 1 END AS b
  FROM busy
),
grp AS (
  SELECT h, SUM(b) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS gid
  FROM brk
),
iv AS (
  SELECT MIN(h) AS start_ts, MAX(h) + INTERVAL 1 HOUR AS end_ts,
         COUNT(*) AS n_hours
  FROM grp GROUP BY gid
)
SELECT iv.start_ts, iv.end_ts, CAST(iv.n_hours AS BIGINT) AS n_hours,
       CAST(COUNT(p.ts) AS BIGINT) AS n_purchases,
       CAST(COALESCE(SUM(
         CAST(CAST(p.value AS DECIMAL(12,2)) * 100 AS BIGINT)), 0)
         AS BIGINT) AS purchase_cents
FROM iv LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND p.ts >= iv.start_ts AND p.ts < iv.end_ts
GROUP BY 1, 2, 3
"""


def hourly_bursts(ev: DataFrame, spine_hours: int = SPINE_HOURS) -> DataFrame:
    """Maximal runs of above-mean hours from an event frame with ``ts``:
    → ``(start_ts, end_ts, n_hours)``, half-open hour-aligned
    intervals.  The mean is over the dense ``spine_hours`` spine, so
    silent hours pull it down without needing zero-fill rows (only the
    TOTAL enters the threshold)."""
    hc = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = hc.agg(F.sum("c").alias("t"))
    busy = hc.join(F.broadcast(tot)).filter(
        F.col("c") * spine_hours > F.col("t")
    )
    w = Window.orderBy("h")
    brk = busy.select(
        "h",
        F.when(
            F.lag("h").over(w) == F.col("h") - F.expr("INTERVAL 1 HOUR"),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("b"),
    )
    grp = brk.select(
        "h",
        F.sum("b")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("gid"),
    )
    return grp.groupBy("gid").agg(
        F.min("h").alias("start_ts"),
        (F.max("h") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    ).drop("gid")


@query("purchases_in_error_bursts", oracle=_BURST_ORACLE)
def purchases_in_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error-burst window (maximal run of above-mean error hours):
    how many purchases landed inside it and their cent volume —
    intervals with zero purchases included (the interesting ones)."""
    ev = load_table(spark, sf_dir, "events")
    # truncate: the interval frame feeds BOTH the range join and the
    # keep-empty-intervals left join — without it the whole island
    # derivation (including its one-row threshold broadcast) runs twice;
    # the frame is calendar-bounded (≤ spine_hours rows).  LAZY: the
    # operator's auto-bin aggregate is the first action and fills the
    # checkpoint in its own job (r13, guide §2.4)
    iv = truncate(
        hourly_bursts(ev.filter(F.col("event_type") == "error").select("ts")),
        eager=False,
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("pts"),
        F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    matched = interval_point_join(
        purchases, iv, point_ts="pts", start_ts="start_ts", end_ts="end_ts",
        bin_us=BIN_US,
    )
    per_iv = matched.groupBy("start_ts", "end_ts").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").alias("purchase_cents"),
    )
    return (
        iv.join(per_iv, ["start_ts", "end_ts"], "left")
        .select(
            "start_ts",
            "end_ts",
            "n_hours",
            F.coalesce("n_purchases", F.lit(0)).cast("bigint").alias(
                "n_purchases"
            ),
            F.coalesce("purchase_cents", F.lit(0)).cast("bigint").alias(
                "purchase_cents"
            ),
        )
    )


# --------------------------------------------------------------------------
# Interval × interval: user sessions overlapping error-burst windows —
# the sessions-vs-outages analysis, through a real overlap join
# (operators/rangejoin.py::interval_overlap_join, first-overlap-bin
# ownership) while the oracle runs the textbook nested-loop
# ls < re AND rs < le join.  Session intervals are closed [first, last]
# event spans converted to half-open by a +1 µs end bump (identical in
# both engines), so single-event sessions survive as 1 µs intervals
# instead of vanishing into the empty half-open set.
# --------------------------------------------------------------------------

_SESSION_OVERLAP_ORACLE = f"""
WITH hc AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events WHERE event_type = 'error' GROUP BY 1
),
tot AS (SELECT SUM(c) AS t FROM hc),
busy AS (SELECT h FROM hc, tot WHERE c * {SPINE_HOURS} > t),
brk AS (
  SELECT h,
         CASE WHEN lag(h) OVER (ORDER BY h) = h - INTERVAL 1 HOUR
              THEN 0 ELSE 1 END AS b
  FROM busy
),
grp AS (
  SELECT h, SUM(b) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS gid
  FROM brk
),
iv AS (
  SELECT MIN(h) AS start_ts, MAX(h) + INTERVAL 1 HOUR AS end_ts,
         COUNT(*) AS n_hours
  FROM grp GROUP BY gid
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('second', lag(ts) OVER w, ts) > {GAP_SECONDS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
),
sessions AS (
  SELECT user_id, session_no, MIN(ts) AS s_start,
         MAX(ts) + INTERVAL 1 MICROSECOND AS s_end
  FROM numbered GROUP BY 1, 2
),
matched AS (
  SELECT iv.start_ts, iv.end_ts, s.user_id,
         epoch_us(LEAST(iv.end_ts, s.s_end))
           - epoch_us(GREATEST(iv.start_ts, s.s_start)) AS o_us
  FROM iv JOIN sessions s
    ON s.s_start < iv.end_ts AND iv.start_ts < s.s_end
)
SELECT iv.start_ts, iv.end_ts, CAST(iv.n_hours AS BIGINT) AS n_hours,
       -- count the never-null overlap length, not user_id: a NULL
       -- user_id session would be skipped here but counted by the
       -- Spark side's count(lit(1)) over matched rows
       CAST(COUNT(m.o_us) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT m.user_id) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(m.o_us), 0) AS BIGINT) AS overlap_us
FROM iv LEFT JOIN matched m
  ON iv.start_ts = m.start_ts AND iv.end_ts = m.end_ts
GROUP BY 1, 2, 3
"""


def user_sessions_intervals(ev: DataFrame) -> DataFrame:
    """Per-user 30-minute-gap sessionization as HALF-OPEN intervals:
    ``(user_id, session_no, s_start, s_end)`` with ``s_end = last
    event + 1 µs``.  The gap rule itself lives in ONE place —
    :func:`~bigdatamlteamrepo_spark.queries.concurrency.user_session_spans`
    (shared with sessions_peak_concurrency), so it cannot drift between
    faces; this wrapper only applies the half-open end bump."""
    from bigdatamlteamrepo_spark.queries.concurrency import (
        user_session_spans,
    )

    return user_session_spans(ev).select(
        "user_id",
        "session_no",
        F.col("start_ts").alias("s_start"),
        F.timestamp_micros(F.unix_micros("end_ts") + 1).alias("s_end"),
    )


@query("session_burst_overlap", oracle=_SESSION_OVERLAP_ORACLE, bench=True)
def session_burst_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error-burst window: how many user sessions overlapped it,
    how many distinct users those were, and the total session∩burst
    microseconds — zero-overlap bursts included.  The Spark plan runs
    the binned overlap join (auto bin width from both sides' interval
    lengths); the oracle runs the nested-loop BETWEEN-style join —
    parity across genuinely different algorithms."""
    ev = load_table(spark, sf_dir, "events")
    # truncate both interval frames: each feeds the auto-bin aggregate,
    # the volume guard, and the explode (bursts additionally feed the
    # keep-empty left join) — without truncation the window derivations
    # would re-run per consumer.  Both frames are bounded: bursts by the
    # calendar, sessions by |users| · sessions-per-user.  LAZY (r13,
    # guide §2.4): the auto-bin tagged aggregate reads BOTH frames and
    # is the first action, so one job fills both checkpoints where two
    # eager barrier jobs used to run first (interleaved A/B at sf0.1:
    # 1.37 → 1.27 s min, 1.45 → 1.38 s med).
    iv = truncate(
        hourly_bursts(ev.filter(F.col("event_type") == "error").select("ts")),
        eager=False,
    )
    sess = truncate(
        user_sessions_intervals(ev.select("user_id", "ts", "event_id")),
        eager=False,
    )
    matched = interval_overlap_join(
        sess.select("user_id", "s_start", "s_end"),
        iv,
        left_start="s_start",
        left_end="s_end",
        right_start="start_ts",
        right_end="end_ts",
    )
    o_us = F.least(F.unix_micros("end_ts"), F.unix_micros("s_end")) - F.greatest(
        F.unix_micros("start_ts"), F.unix_micros("s_start")
    )
    per_iv = matched.groupBy("start_ts", "end_ts").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(o_us).cast("bigint").alias("overlap_us"),
    )
    return iv.join(per_iv, ["start_ts", "end_ts"], "left").select(
        "start_ts",
        "end_ts",
        "n_hours",
        F.coalesce("n_sessions", F.lit(0)).cast("bigint").alias("n_sessions"),
        F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
        F.coalesce("overlap_us", F.lit(0)).cast("bigint").alias("overlap_us"),
    )
