"""Experimentation faces: z-statistic against a hand formula, cohort
assignment = md5 parity, and CUPED removing a planted pre-period
imbalance that the raw lift falsely reports."""

from __future__ import annotations

import hashlib
import math

import bigdatamlteamrepo_spark.queries.abtest as ab


def _cohort(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2


def _with_table(spark, rows, fn):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    orig = ab.load_table
    ab.load_table = lambda *_a, **_k: df
    try:
        return fn(spark, "ignored").collect()
    finally:
        ab.load_table = orig


def _mk(eid, day, uid, etype, value):
    import datetime as dt

    return (eid, dt.datetime(2024, 1, day, 12, 0), uid, etype, value)


def test_ab_z_matches_hand_formula(spark):
    # 40 users; users 0..9 of cohort-by-hash get a high-value purchase
    rows = []
    eid = 0
    converted = set()
    for uid in range(40):
        eid += 1
        rows.append(_mk(eid, 5, uid, "view", 10.0))
        if uid % 4 == 0:  # every 4th user converts
            eid += 1
            rows.append(_mk(eid, 20, uid, "purchase", 300.0))
            converted.add(uid)
    out = _with_table(spark, rows, ab.events_ab_test_purchase_rate)[0]
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid in range(40):
        c = _cohort(uid)
        n[c] += 1
        conv[c] += uid in converted
    assert (out["n_a"], out["n_b"]) == (n[0], n[1])
    assert (out["conv_a"], out["conv_b"]) == (conv[0], conv[1])
    p = (conv[0] + conv[1]) / 40
    z = (conv[0] / n[0] - conv[1] / n[1]) / math.sqrt(
        p * (1 - p) * (1 / n[0] + 1 / n[1])
    )
    assert out["z_milli"] == round(z * 1000)
    assert out["rate_a_micro"] == (2 * conv[0] * 10**6 + n[0]) // (2 * n[0])


def test_low_value_purchases_do_not_convert(spark):
    """Below-threshold purchases never convert — and the fully
    degenerate pooled rate (0) yields a NULL z, not a crash."""
    rows = [_mk(i, 5, i, "purchase", 50.0) for i in range(10)]
    out = _with_table(spark, rows, ab.events_ab_test_purchase_rate)[0]
    assert out["conv_a"] == 0 and out["conv_b"] == 0
    assert out["z_milli"] is None


def test_cuped_removes_planted_preperiod_imbalance(spark):
    """Users' post value == pre value (perfect covariate, no true
    effect); cohort A users are planted with systematically larger pre
    values.  Raw lift reports the imbalance; CUPED must cancel it."""
    rows = []
    eid = 0
    for uid in range(60):
        base = 100.0 + (uid % 7) * 40.0
        if _cohort(uid) == 0:
            base += 120.0  # planted imbalance toward cohort A
        eid += 1
        rows.append(_mk(eid, 5, uid, "view", base))        # pre period
        eid += 1
        rows.append(_mk(eid, 25, uid, "view", base))       # post period
    out = _with_table(spark, rows, ab.events_cuped_adjusted_lift)[0]
    assert out["n_users"] == 60
    # y == x exactly: theta == 1, full variance elimination
    assert abs(out["theta"] - 1.0) < 1e-6
    assert abs(out["var_reduction"] - 1.0) < 1e-6
    assert abs(out["raw_lift_micro"]) > 50 * 10**6  # imbalance visible raw
    assert abs(out["cuped_lift_micro"]) <= 1        # gone after adjustment


def test_cuped_keeps_a_true_posteffect(spark):
    """A genuine post-period treatment effect on cohort A must SURVIVE
    the adjustment (CUPED removes covariate noise, not the effect)."""
    rows = []
    eid = 0
    for uid in range(60):
        base = 100.0 + (uid % 7) * 40.0
        eid += 1
        rows.append(_mk(eid, 5, uid, "view", base))
        post = base + (200.0 if _cohort(uid) == 0 else 0.0)
        eid += 1
        rows.append(_mk(eid, 25, uid, "view", post))
    out = _with_table(spark, rows, ab.events_cuped_adjusted_lift)[0]
    assert out["cuped_lift_micro"] > 150 * 10**6
    assert abs(out["cuped_lift_micro"] - out["raw_lift_micro"]) < 60 * 10**6
