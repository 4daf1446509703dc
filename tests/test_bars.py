"""OHLC bars + TWAP: hand-stream pins (known candles, timestamp-tie
determinism), the brute-force global-segment TWAP vs the day-decomposed
plan, and invariant checks at a real SF."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.bars import MICRO, twap_by_type

_T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ticks_df(spark, ticks):
    """ticks: (event_type, event_id, offset_seconds, cents)."""
    rows = [
        (t, i, _T0 + dt.timedelta(seconds=s), c) for t, i, s, c in ticks
    ]
    return spark.createDataFrame(
        rows, "event_type string, event_id bigint, ts timestamp, cents bigint"
    )


def _py_twap(ticks):
    """Brute-force GLOBAL segment definition: sort each type's ticks by
    (ts, event_id); every consecutive pair is one segment weighted by
    its duration — no day decomposition."""
    by_type: dict[str, list] = {}
    for t, i, s, c in ticks:
        by_type.setdefault(t, []).append((s, i, c))
    out = {}
    for t, rows in by_type.items():
        rows.sort()
        segs = [
            (c, int((s2 - s1) * 1_000_000))
            for (s1, _, c), (s2, _, _) in zip(rows, rows[1:])
        ]
        num = sum(c * d for c, d in segs)
        den = sum(d for _, d in segs)
        out[t] = {
            "n_segments": len(segs),
            "total_dt_us": den,
            "twap_microcents": (2 * num * MICRO + den) // (2 * den),
        }
    return out


def test_twap_hand_stream(spark):
    """100 cents held for 9 s then 200 cents for 1 s → TWAP 110 cents
    (the burst-robustness the plain mean misses: mean is 150)."""
    ticks = [("a", 1, 0.0, 100), ("a", 2, 9.0, 200), ("a", 3, 10.0, 999)]
    row = twap_by_type(_ticks_df(spark, ticks)).collect()[0]
    assert row["n_segments"] == 2
    assert row["total_dt_us"] == 10_000_000
    assert row["twap_microcents"] == 110 * MICRO
    # unweighted mean over the SAME segment sample (100, 200) = 150:
    # the duration weighting is the only difference from the TWAP
    assert row["mean_microcents"] == 150 * MICRO


def test_twap_day_decomposition_equals_global_segments(spark):
    """Ticks spanning several days, including a type that skips a whole
    day: the (type, day)-window + boundary-frame plan must reproduce the
    global consecutive-pair segment multiset exactly."""
    day = 86_400.0
    ticks = [
        # type a: ticks on days 0, 1, 2
        ("a", 1, 100.0, 10),
        ("a", 2, 200.0, 20),
        ("a", 3, day + 50.0, 30),
        ("a", 4, 2 * day + 10.0, 40),
        # type b: day 0 and day 2 only — the boundary lead must skip the
        # tick-free day 1 and span the 2-day gap
        ("b", 5, 300.0, 70),
        ("b", 6, 2 * day + 500.0, 80),
        ("b", 7, 2 * day + 600.0, 90),
    ]
    got = {
        r["event_type"]: r
        for r in twap_by_type(_ticks_df(spark, ticks)).collect()
    }
    want = _py_twap(ticks)
    for t, w in want.items():
        for k, v in w.items():
            assert got[t][k] == v, (t, k)


def test_twap_constant_value_equals_mean(spark):
    """All ticks share one value → TWAP == mean == value, regardless of
    spacing (the weighting cannot matter)."""
    ticks = [("a", i, float(i * i), 250) for i in range(1, 8)]
    row = twap_by_type(_ticks_df(spark, ticks)).collect()[0]
    assert row["twap_microcents"] == 250 * MICRO
    assert row["mean_microcents"] == 250 * MICRO


def test_twap_timestamp_tie_uses_event_id(spark):
    """Two ticks at the SAME timestamp: the (ts, event_id) total order
    makes the zero-length segment deterministic — and total duration
    still spans first→last."""
    ticks = [("a", 2, 5.0, 999), ("a", 1, 5.0, 100), ("a", 3, 15.0, 50)]
    row = twap_by_type(_ticks_df(spark, ticks)).collect()[0]
    # segments: (100, 0 us) then (999, 10 s) → TWAP = 999
    assert row["n_segments"] == 2
    assert row["total_dt_us"] == 10_000_000
    assert row["twap_microcents"] == 999 * MICRO


def test_ohlc_face_invariants(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = QUERIES["events_value_ohlc_hourly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low_cents"] <= r["open_cents"] <= r["high_cents"]
        assert r["low_cents"] <= r["close_cents"] <= r["high_cents"]
        assert r["n_ticks"] >= 1
        assert (
            r["n_ticks"] * r["low_cents"]
            <= r["volume_cents"]
            <= r["n_ticks"] * r["high_cents"]
        )


def test_ohlc_hand_candle(spark):
    """One hour of hand ticks → the known candle, with open decided by
    event_id under a timestamp tie."""
    rows = [
        ("a", 2, _T0, 300.0),             # ts tie with event 1 → NOT open
        ("a", 1, _T0, 100.0),             # open (same ts, smaller id)
        ("a", 3, _T0 + dt.timedelta(minutes=30), 5.0),   # low
        ("a", 4, _T0 + dt.timedelta(minutes=59), 250.0),  # close
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id bigint, ts timestamp, value double"
    )
    got = (
        df.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_ts"),
            F.struct("ts", "event_id").alias("tick"),
            F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            F.min_by("cents", "tick").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", "tick").alias("close_cents"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("cents").alias("volume_cents"),
        )
        .collect()
    )
    assert len(got) == 1
    r = got[0]
    assert (r["open_cents"], r["high_cents"], r["low_cents"], r["close_cents"]) == (
        10_000,
        30_000,
        500,
        25_000,
    )
    assert r["n_ticks"] == 4 and r["volume_cents"] == 65_500
