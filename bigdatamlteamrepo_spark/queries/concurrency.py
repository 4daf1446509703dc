"""Peak concurrency: how many sessions were open at once — sweep-line
over session intervals.

The capacity question every service asks ("size for the peak, not the
mean") is an interval-overlap MAXIMUM: build session intervals from
the event stream (same 30-minute inactivity rule as
``events_user_sessions``), emit a +1 at each start and a −1 at each
end, and take the running sum's maximum — the textbook sweep line.

The running sum is GLOBAL (no partition key), which is exactly the
case Spark's window API serializes onto one task; the Spark plan here
runs it through
:func:`~bigdatamlteamrepo_spark.operators.prefixsum.partitioned_running_sum`
(two-phase Blelloch scan: range-partition → within-partition window →
broadcast per-partition offsets) while the DuckDB oracle uses the
plain single window — parity across a serial and a parallel prefix
sum.

Tie discipline: boundaries sort by ``(ts, delta DESC, user_id,
session_no)`` — a unique total order (one user's sessions are
disjoint), with starts before ends at the same instant, so a
single-event session is counted alive at its instant (closed-interval
convention) identically in both engines.

Day attribution: a day's peak is the maximum concurrency observed AT A
BOUNDARY within that day.  The event corpus has boundaries every day;
a truly silent day would inherit its constant concurrency from the
previous boundary and is deliberately absent rather than interpolated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.prefixsum import partitioned_running_sum
from bigdatamlteamrepo_spark.queries.registry import query

#: session inactivity timeout — same rule as events_user_sessions
GAP_SECONDS = 1800


def user_session_spans(ev: DataFrame) -> DataFrame:
    """Per-user 30-minute-gap sessionization (the events_user_sessions
    rule: whole-second lag diff > GAP_SECONDS) as CLOSED event spans —
    ``(user_id, session_no, start_ts, end_ts)`` with start/end the
    first/last event instants.  Shared by this face and the
    bursts overlap face (which bumps the end by +1 µs to go
    half-open); the single definition keeps the gap rule from
    drifting between faces."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            > GAP_SECONDS,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )

_PEAK_ORACLE = f"""
WITH flagged AS (
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
  SELECT user_id, session_no, MIN(ts) AS start_ts, MAX(ts) AS end_ts
  FROM numbered GROUP BY 1, 2
),
boundaries AS (
  SELECT start_ts AS ts, 1 AS delta, user_id, session_no FROM sessions
  UNION ALL
  SELECT end_ts, -1, user_id, session_no FROM sessions
),
swept AS (
  SELECT ts, delta,
         SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_no
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM boundaries
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_session_starts
FROM swept GROUP BY 1
"""


@query("sessions_peak_concurrency", oracle=_PEAK_ORACLE)
def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: the maximum number of simultaneously open user sessions
    (30-minute inactivity rule), plus boundary and session-start
    counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sessions = user_session_spans(ev)
    boundaries = sessions.select(
        F.col("start_ts").alias("ts"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_no",
    ).unionByName(
        sessions.select(
            F.col("end_ts").alias("ts"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_no",
        )
    )
    # starts before ends at the same instant: sort on -delta ascending
    swept = partitioned_running_sum(
        boundaries.withColumn("neg_delta", -F.col("delta")),
        order_cols=["ts", "neg_delta", "user_id", "session_no"],
        value_col="delta",
        out_col="conc",
    )
    return swept.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrent"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_session_starts"),
    )
