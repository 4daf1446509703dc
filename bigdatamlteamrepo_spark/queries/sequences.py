"""Sequential pattern mining over per-user event streams.

The session-analytics pair clickstream warehouses run (Agrawal &
Srikant 1995, "Mining Sequential Patterns"; first-order Markov chains
for user-journey modeling): order each user's events by time and mine

* the **transition matrix** — counts and probabilities of
  ``prev_type → type`` steps (the first-order Markov model of user
  behavior; journey-simulation and churn models consume it), and
* the **top contiguous trigrams** — the most frequent 3-step journeys
  (the PrefixSpan head for contiguous patterns).

Both are one window pass: ``lag(event_type)`` (twice for trigrams) over
``(user_id; ts, event_id)``, then a map-side-combinable count — shuffle
volume is |types|² / |types|³ cells, never the event count.  Per-user
ordering state is the window sort, bounded by a user's own history; no
collect_list materializes a whole user sequence into one row.

Transition probabilities are half-away micro units from exact integer
counts (the DSIR rational idiom), so both engines agree on every tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale for transition probabilities
MICRO = 1_000_000
#: trigram faces emit the top-K journeys
TRIGRAM_TOP_K = 20

_SEQ_SQL = """
seq AS (
  SELECT user_id, event_type,
         lag(event_type)    OVER w AS t1,
         lag(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""

_TRANSITION_ORACLE = (
    "WITH "
    + _SEQ_SQL
    + f"""
, c AS (
  SELECT t1 AS prev_type, event_type AS next_type, COUNT(*) AS n_steps
  FROM seq WHERE t1 IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_steps,
       CAST((2 * n_steps * {MICRO} + SUM(n_steps) OVER (PARTITION BY prev_type))
            // (2 * SUM(n_steps) OVER (PARTITION BY prev_type)) AS BIGINT)
         AS p_micro
FROM c
"""
)

_TRIGRAM_ORACLE = (
    "WITH "
    + _SEQ_SQL
    + f"""
SELECT t2 || '>' || t1 || '>' || event_type AS trigram,
       COUNT(*) AS n
FROM seq WHERE t2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, trigram
LIMIT {TRIGRAM_TOP_K}
"""
)


def _with_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
    )


@query("events_type_transition_matrix", oracle=_TRANSITION_ORACLE)
def events_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: step counts
    and row-normalized probabilities (micro units) for every observed
    ``prev_type → next_type`` pair."""
    steps = (
        _with_lags(spark, sf_dir)
        .filter(F.col("t1").isNotNull())
        .groupBy(F.col("t1").alias("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_steps"))
    )
    return steps.select(
        "prev_type",
        "next_type",
        "n_steps",
        F.expr(
            f"CAST((2 * n_steps * {MICRO} + SUM(n_steps) OVER"
            f" (PARTITION BY prev_type))"
            f" div (2 * SUM(n_steps) OVER (PARTITION BY prev_type)) AS BIGINT)"
        ).alias("p_micro"),
    )


@query("events_type_top_trigrams", oracle=_TRIGRAM_ORACLE)
def events_type_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {K} most frequent contiguous 3-step user journeys
    (``a>b>c`` strings), ties broken lexically."""
    tri = (
        _with_lags(spark, sf_dir)
        .filter(F.col("t2").isNotNull())
        .select(
            F.concat_ws(">", "t2", "t1", "event_type").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return tri.orderBy(F.col("n").desc(), "trigram").limit(TRIGRAM_TOP_K)


events_type_top_trigrams.__doc__ = events_type_top_trigrams.__doc__.format(
    K=TRIGRAM_TOP_K
)
