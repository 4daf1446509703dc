"""Parallel prefix sum + the peak-concurrency sweep: the two-phase
scan equals a single global window at every partition count, the face
equals a pure-Python sessionize-and-sweep replica, and cross-face
session counts agree."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.prefixsum import partitioned_running_sum
from bigdatamlteamrepo_spark.queries.concurrency import GAP_SECONDS


@pytest.mark.parametrize("n_parts", [1, 3, 7, 64])
def test_matches_single_window_running_sum(spark, n_parts):
    """Exact equality with the serial window — including negative
    values (sweep deltas) and more partitions than rows."""
    rng = random.Random(23)
    rows = [
        (i, rng.choice([-3, -1, 1, 2, 5])) for i in range(200)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k bigint, x bigint")
    got = {
        r["k"]: r["run"]
        for r in partitioned_running_sum(
            df, order_cols=["k"], value_col="x", out_col="run",
            num_partitions=n_parts,
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["run"]
        for r in df.withColumn("run", F.sum("x").over(w)).collect()
    }
    assert got == want


def test_passthrough_columns_survive(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k bigint, x bigint, tag string"
    )
    out = partitioned_running_sum(
        df, order_cols=["k"], value_col="x", out_col="run", num_partitions=4
    )
    assert sorted(out.columns) == ["k", "run", "tag", "x"]
    assert {(r["k"], r["tag"], r["run"]) for r in out.collect()} == {
        (1, "a", 10),
        (2, "b", 30),
    }


def _py_peak_by_day(events):
    """Sessionize (30-min gap) + sweep line, straight from the
    definition: events = (user_id, ts_epoch, event_id)."""
    by_user: dict[int, list] = {}
    for u, t, i in events:
        by_user.setdefault(u, []).append((t, i))
    boundaries = []
    for u, evs in by_user.items():
        evs.sort()
        start = prev = evs[0][0]
        sno = 0
        for t, _ in evs[1:]:
            if t - prev > GAP_SECONDS:
                boundaries += [(start, 1, u, sno), (prev, -1, u, sno)]
                sno += 1
                start = t
            prev = t
        boundaries += [(start, 1, u, sno), (prev, -1, u, sno)]
    boundaries.sort(key=lambda b: (b[0], -b[1], b[2], b[3]))
    conc = 0
    peak: dict[int, int] = {}
    starts: dict[int, int] = {}
    for t, d, _, _ in boundaries:
        conc += d
        day = int(t // 86_400)
        peak[day] = max(peak.get(day, conc), conc)
        if d == 1:
            starts[day] = starts.get(day, 0) + 1
    return peak, starts


def test_face_matches_python_sweep(spark, sf_dir):
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    ev = [
        (r["user_id"], r["ts"].timestamp(), r["event_id"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    ]
    want_peak, want_starts = _py_peak_by_day(ev)
    rows = QUERIES["sessions_peak_concurrency"](spark, sf_dir).collect()
    got_peak = {
        int(r["day"].timestamp() // 86_400): r["peak_concurrent"] for r in rows
    }
    got_starts = {
        int(r["day"].timestamp() // 86_400): r["n_session_starts"] for r in rows
    }
    assert got_peak == want_peak
    assert got_starts == want_starts


def test_total_sessions_agree_with_sessionization_face(spark, sf_dir):
    """Σ n_session_starts over days == Σ n_sessions from
    events_user_sessions — two independent faces, one truth."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    starts = sum(
        r["n_session_starts"]
        for r in QUERIES["sessions_peak_concurrency"](spark, sf_dir).collect()
    )
    sessions = sum(
        r["n_sessions"]
        for r in QUERIES["events_user_sessions"](spark, sf_dir).collect()
    )
    assert starts == sessions


def test_validate_rejects_duplicate_sort_keys(spark):
    """The eager guard: validate=True turns the documented unique-key
    contract into AmbiguousOrderError (one count-vs-distinct scalar
    aggregate) instead of one of several silently valid outputs."""
    from bigdatamlteamrepo_spark.operators.prefixsum import (
        AmbiguousOrderError,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 30), (3, 40)], "k bigint, x bigint"
    )
    with pytest.raises(AmbiguousOrderError, match="not a total order"):
        partitioned_running_sum(
            df, order_cols=["k"], value_col="x", out_col="run",
            num_partitions=4, validate=True,
        )


def test_validate_passes_unique_keys_unchanged(spark):
    df = spark.createDataFrame(
        [(3, 1), (1, 2), (2, 3)], "k bigint, x bigint"
    )
    got = {
        (r["k"], r["run"])
        for r in partitioned_running_sum(
            df, order_cols=["k"], value_col="x", out_col="run",
            num_partitions=3, validate=True,
        ).collect()
    }
    assert got == {(1, 2), (2, 5), (3, 6)}
