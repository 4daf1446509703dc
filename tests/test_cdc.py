"""CDC compaction + snapshot diff: hand-log pins for all four
statuses, tie-break semantics, one-aggregation plan shape, and the
window-vs-struct-max cross-idiom equality."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.cdc import compact_log, snapshot_diff


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


_SPLIT = _ts("2024-01-10 00:00:00")

#: (user, ts, event_id, type, value)
_LOG = [
    # u1: latest pre-split row stays latest → unchanged
    (1, "2024-01-05 10:00:00", 100, "view", 1.0),
    (1, "2024-01-06 10:00:00", 101, "click", 2.0),
    # u2: post-split event with a DIFFERENT payload → changed
    (2, "2024-01-05 09:00:00", 200, "view", 1.0),
    (2, "2024-01-15 09:00:00", 201, "purchase", 9.0),
    # u3: post-split event with the SAME payload → noop_update
    (3, "2024-01-03 08:00:00", 300, "view", 5.0),
    (3, "2024-01-20 08:00:00", 301, "view", 5.0),
    # u4: first event after the split → added
    (4, "2024-01-12 07:00:00", 400, "click", 3.0),
    # u5: same-ts tie inside the pre-split window → event_id breaks it
    (5, "2024-01-02 06:00:00", 500, "view", 1.0),
    (5, "2024-01-02 06:00:00", 501, "click", 2.0),
]


def _log_df(spark):
    return spark.createDataFrame(
        [(u, _ts(t), e, ty, v) for u, t, e, ty, v in _LOG],
        "user_id bigint, ts timestamp, event_id bigint, "
        "event_type string, value double",
    )


def _diff(spark):
    return snapshot_diff(
        _log_df(spark),
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        payload=["event_type", "value"],
        split=F.lit(_SPLIT),
    )


def test_all_four_statuses(spark):
    got = {r["user_id"]: (r["status"], r["event_type"]) for r in _diff(spark).collect()}
    assert got == {
        1: ("unchanged", "click"),
        2: ("changed", "purchase"),
        3: ("noop_update", "view"),
        4: ("added", "click"),
        5: ("unchanged", "click"),  # tie at same ts → higher event_id
    }


def test_compact_log_tiebreak(spark):
    got = {
        r["user_id"]: (r["event_id"], r["event_type"])
        for r in compact_log(
            _log_df(spark), "user_id", "ts", "event_id", ["event_type", "value"]
        ).collect()
    }
    assert got[5] == (501, "click")
    assert got[2] == (201, "purchase")


def test_diff_matches_window_idiom(spark):
    """The struct-max one-pass diff must equal the row_number two-window
    compaction joined by hand — the idiom the oracle uses."""
    from pyspark.sql import Window

    df = _log_df(spark)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def compact(frame):
        return (
            frame.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "event_id", "event_type", "value")
        )

    s2 = compact(df)
    s1 = compact(df.filter(F.col("ts") <= F.lit(_SPLIT))).select(
        "user_id",
        F.col("event_id").alias("oe"),
        F.col("event_type").alias("ot"),
        F.col("value").alias("ov"),
    )
    ref = s2.join(s1, "user_id", "left").select(
        "user_id",
        F.when(F.col("oe").isNull(), "added")
        .when(F.col("event_id") == F.col("oe"), "unchanged")
        .when(
            (F.col("event_type") == F.col("ot")) & (F.col("value") == F.col("ov")),
            "noop_update",
        )
        .otherwise("changed")
        .alias("status"),
    )
    got = {(r["user_id"], r["status"]) for r in _diff(spark).select("user_id", "status").collect()}
    exp = {(r["user_id"], r["status"]) for r in ref.collect()}
    assert got == exp


def test_one_pass_plan(spark):
    """The whole diff must plan exactly one Exchange (the key groupBy)
    — no join, no window sort."""
    plan = _diff(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "WindowExec" not in plan


def test_partitioning_invariance(spark):
    a = sorted(tuple(r) for r in _diff(spark).collect())
    d2 = snapshot_diff(
        _log_df(spark).repartition(11, F.col("event_id")),
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        payload=["event_type", "value"],
        split=F.lit(_SPLIT),
    )
    assert a == sorted(tuple(r) for r in d2.collect())
