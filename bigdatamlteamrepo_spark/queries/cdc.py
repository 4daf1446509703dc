"""CDC log compaction + snapshot diff over the append-only event log.

The change-data-capture pair every lakehouse ingest runs (Debezium /
Delta MERGE semantics; Armbrust et al. 2020, "Delta Lake:
High-Performance ACID Table Storage", VLDB): an append-only log
compacts to "latest row per key", and two compacted snapshots diff into
added / changed / no-op-updated / unchanged keys — the audit that tells
an incremental pipeline how much downstream work a batch actually
carries.

Snapshots here: per ``user_id``, the latest event (by ``ts``, tie-break
``event_id``) **as of the split instant** ``T_SPLIT`` vs as of the full
log.  Statuses:

* ``added``      — key has no event before the split;
* ``changed``    — a newer event exists AND the compacted payload
  (event_type, value) differs;
* ``noop_update``— a newer event exists but the payload is identical
  (the Debezium "empty diff" case downstream MERGEs want to skip);
* ``unchanged``  — the latest event is still the pre-split one.

Distributed shape (the part that matters at 100 TB):

* BOTH snapshots come from ONE map-side-combinable aggregation:
  "latest row" is ``max(struct(ts, event_id, payload…))`` (struct
  ordering is lexicographic in both engines), and the pre-split
  snapshot is the same max over a ``WHEN ts <= split`` conditional —
  so one groupBy on the key computes the whole diff.  No window sort,
  no self-join: per-key state is ONE struct regardless of log length,
  and partial aggregation collapses each map task to |keys| rows
  before the shuffle — strictly cheaper than the row_number idiom,
  which must sort every log row.
* The status CASE and the final (status, type) rollup run on the
  |keys|-sized compacted frame.

Oracle: DuckDB compacts via two QUALIFY row_number windows instead —
same semantics through a genuinely different plan, so parity is a
cross-idiom check, not a replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: snapshot split instant: early enough that some keys' first event is
#: after it (exercising 'added') at every driver SF
T_SPLIT = "2024-01-03 00:00:00"

_CDC_ORACLE = f"""
WITH s2 AS (
  SELECT user_id, event_id, event_type, value
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) = 1
),
s1 AS (
  SELECT user_id, event_id, event_type, value
  FROM events
  WHERE ts <= TIMESTAMP '{T_SPLIT}'
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) = 1
),
d AS (
  SELECT s2.event_type,
         CASE
           WHEN s1.user_id IS NULL THEN 'added'
           WHEN s2.event_id = s1.event_id THEN 'unchanged'
           WHEN s2.event_type = s1.event_type AND s2.value = s1.value
             THEN 'noop_update'
           ELSE 'changed'
         END AS status
  FROM s2 LEFT JOIN s1 USING (user_id)
)
SELECT status, event_type, COUNT(*) AS n_keys
FROM d GROUP BY 1, 2
"""


def compact_log(
    log: DataFrame, key: str, ts: str, tiebreak: str, payload: list[str]
) -> DataFrame:
    """Latest row per key of an append-only change log — the struct-max
    aggregate form (one map-side-combinable groupBy, no window sort)."""
    latest = F.max(F.struct(ts, tiebreak, *payload)).alias("__l")
    return log.groupBy(key).agg(latest).select(
        key, f"__l.{tiebreak}", *[f"__l.{p}" for p in payload]
    )


def snapshot_diff(
    log: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    payload: list[str],
    split,
) -> DataFrame:
    """Per-key CDC status between the log compacted at ``split`` and
    the fully-compacted log, in ONE aggregation pass.

    Returns ``(key, *payload-of-latest, status)`` with status ∈
    added / changed / noop_update / unchanged (see module doc).
    """
    row = F.struct(ts, tiebreak, *payload)
    agg = log.groupBy(key).agg(
        F.max(row).alias("s2"),
        F.max(F.when(F.col(ts) <= split, row)).alias("s1"),
    )
    payload_same = None
    for p in payload:
        eq = F.col(f"s2.{p}") == F.col(f"s1.{p}")
        payload_same = eq if payload_same is None else (payload_same & eq)
    return agg.select(
        key,
        *[F.col(f"s2.{p}").alias(p) for p in payload],
        F.when(F.col("s1").isNull(), F.lit("added"))
        .when(F.col(f"s2.{tiebreak}") == F.col(f"s1.{tiebreak}"), F.lit("unchanged"))
        .when(payload_same, F.lit("noop_update"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


@query("events_cdc_snapshot_diff", oracle=_CDC_ORACLE)
def events_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff of the compacted event log at ``T_SPLIT`` vs the
    full log: per (status, latest event_type) key counts — added /
    changed / noop_update / unchanged."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    d = snapshot_diff(
        ev,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        payload=["event_type", "value"],
        split=F.lit(T_SPLIT).cast("timestamp"),
    )
    return d.groupBy("status", "event_type").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
