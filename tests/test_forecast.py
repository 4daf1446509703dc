"""Forecast backtest: hand stream with a planted hour-of-day season
(seasonal MAE must beat the global naive), zero-filled spine
accounting, and the signed-bias arithmetic on a negative case."""

from __future__ import annotations

import datetime as dt

import bigdatamlteamrepo_spark.queries.forecast as fc


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp"
    )


def _run(spark, rows):
    df = _mk_events(spark, rows)
    orig = fc.load_table
    fc.load_table = lambda *_a, **_k: df
    try:
        return {
            r["event_type"]: r
            for r in fc.events_hourly_forecast_backtest(spark, "ignored").collect()
        }
    finally:
        fc.load_table = orig


def _hours(day_lo, day_hi):
    for day in range(day_lo, day_hi):
        for h in range(24):
            yield dt.datetime(2024, 1, day, h, 30)


def test_seasonal_model_beats_naive_on_planted_season(spark):
    """Type 's' fires 5×/hour during hours 8-16 and 1×/hour otherwise,
    every day (pure hour-of-day signal): the seasonal model should
    predict it near-exactly while the global mean misses by the
    amplitude."""
    rows = []
    for ts in _hours(1, 31):
        n = 5 if 8 <= ts.hour <= 16 else 1
        rows += [("s", ts)] * n
    out = _run(spark, rows)["s"]
    assert out["n_test_hours"] == 168
    assert out["mae_micro"] == 0          # the season repeats exactly
    assert out["naive_mae_micro"] > 10**6  # global mean off by >1 count
    assert out["bias_micro"] == 0


def test_zero_event_hours_are_counted(spark):
    """A type that only ever fires at noon: the other 23 test hours per
    day must enter the MAE as zeros (161 zero cells on the spine)."""
    rows = [("noon", dt.datetime(2024, 1, d, 12, 30)) for d in range(1, 31)]
    out = _run(spark, rows)["noon"]
    assert out["n_test_hours"] == 168
    assert out["mae_micro"] == 0  # model: 1 at noon, 0 elsewhere — exact


def test_negative_bias_sign_split(spark):
    """Train volume 4/hour, test volume 1/hour → actual < pred, bias
    negative; the sign-split half-away mean must match the hand value."""
    rows = []
    for ts in _hours(1, 24):
        rows += [("drop", ts)] * 4
    for ts in _hours(24, 31):
        rows += [("drop", ts)] * 1
    out = _run(spark, rows)["drop"]
    # pred = 4.0 per hour exactly; actual = 1.0 → error = -3.0 per hour
    assert out["bias_micro"] == -3 * 10**6
    assert out["mae_micro"] == 3 * 10**6
