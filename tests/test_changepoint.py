"""CUSUM changepoint: the prefix-min closed form vs the literal
max(0, ·) recursion (pure Python), planted-shift alarms in both
directions, in-control silence, and the zero-event-day sensitivity the
dense spine exists for."""

from __future__ import annotations

import datetime as dt

from bigdatamlteamrepo_spark.queries.changepoint import (
    DEN_H,
    DEN_K,
    MICRO,
    two_sided_cusum,
)

_D0 = dt.date(2024, 3, 1)


def _daily_df(spark, counts_by_type, train_days):
    rows = [
        (t, _D0 + dt.timedelta(days=i), c)
        for t, cs in counts_by_type.items()
        for i, c in enumerate(cs)
    ]
    df = spark.createDataFrame(rows, "event_type string, day date, c bigint")
    train_end = (_D0 + dt.timedelta(days=train_days - 1)).isoformat()
    return two_sided_cusum(df, train_end=train_end, train_days=train_days)


def _py_cusum(counts, train_days):
    """The literal Page recursion S_t = max(0, S_{t-1} + x_t - mu - k) —
    the semantics the window-based closed form must reproduce."""
    train = counts[:train_days]
    mu = (2 * sum(train) * MICRO + train_days) // (2 * train_days)
    k, h = mu // DEN_K, mu // DEN_H
    sp = sm = 0
    sp_max = sm_max = 0
    first_up = first_dn = None
    n_alarm = 0
    for i, c in enumerate(counts[train_days:]):
        sp = max(0, sp + c * MICRO - mu - k)
        sm = max(0, sm + mu - c * MICRO - k)
        sp_max, sm_max = max(sp_max, sp), max(sm_max, sm)
        day = _D0 + dt.timedelta(days=train_days + i)
        if sp > h and first_up is None:
            first_up = day
        if sm > h and first_dn is None:
            first_dn = day
        if sp > h or sm > h:
            n_alarm += 1
    return {
        "h_micro": h,
        "s_plus_max": sp_max,
        "s_minus_max": sm_max,
        "first_up_alarm": first_up,
        "first_down_alarm": first_dn,
        "n_alarm_days": n_alarm,
    }


def _check(spark, counts_by_type, train_days):
    got = {
        r["event_type"]: r
        for r in _daily_df(spark, counts_by_type, train_days).collect()
    }
    for t, counts in counts_by_type.items():
        want = _py_cusum(counts, train_days)
        r = got[t]
        assert r["n_monitor_days"] == len(counts) - train_days, t
        for key, v in want.items():
            g = r[key]
            if key.startswith("first_") and g is not None:
                g = g.date()
            assert g == v, (t, key, g, v)
    return got


def test_closed_form_equals_recursion_on_noise(spark):
    """Deterministic pseudo-noise around the mean, including dips that
    clamp the statistic at 0 — the case where a plain running sum
    (no prefix-min correction) would go negative and diverge."""
    counts = [10, 12, 8, 11, 9, 10, 13, 7, 10, 11, 9, 12, 8, 10, 11, 9, 14, 6]
    _check(spark, {"noise": counts}, train_days=10)


def test_planted_upward_shift_alarms(spark):
    counts = [10] * 8 + [13] * 8  # +30% sustained shift
    got = _check(spark, {"up": counts}, train_days=8)
    assert got["up"]["first_up_alarm"] is not None
    assert got["up"]["first_down_alarm"] is None


def test_planted_downward_shift_alarms(spark):
    counts = [10] * 8 + [7] * 8
    got = _check(spark, {"dn": counts}, train_days=8)
    assert got["dn"]["first_down_alarm"] is not None
    assert got["dn"]["first_up_alarm"] is None


def test_in_control_stream_stays_silent(spark):
    """Noise inside the allowance band never alarms: |x − μ| ≤ k means
    every deviation is absorbed and both statistics stay clamped near 0."""
    counts = [100, 101, 99, 100, 100, 101, 99, 100] + [100, 101, 99] * 4
    got = _check(spark, {"flat": counts}, train_days=8)
    assert got["flat"]["n_alarm_days"] == 0
    assert got["flat"]["first_up_alarm"] is None
    assert got["flat"]["first_down_alarm"] is None


def test_outage_day_trips_lower_cusum(spark):
    """A short total outage (zero-count days): exactly the signal the
    dense day spine preserves — a sparse count frame would silently drop
    the rows and never alarm."""
    counts = [20] * 10 + [20, 0, 0, 0, 20, 20]
    got = _check(spark, {"out": counts}, train_days=10)
    assert got["out"]["first_down_alarm"] is not None


def test_mixed_types_isolate(spark):
    """Per-type independence: one shifting type must not alarm the
    in-control one sharing the frame."""
    got = _check(
        spark,
        {"shift": [10] * 8 + [14] * 8, "calm": [10] * 16},
        train_days=8,
    )
    assert got["shift"]["n_alarm_days"] > 0
    assert got["calm"]["n_alarm_days"] == 0


def test_face_registered_and_oracle_paired():
    from bigdatamlteamrepo_spark.queries.registry import ORACLE, QUERIES

    assert "events_cusum_changepoint" in QUERIES
    assert "events_cusum_changepoint" in ORACLE
