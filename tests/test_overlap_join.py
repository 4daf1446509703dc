"""Interval×interval overlap join: brute-force equality across
misaligned bin widths (exactly-once via first-overlap-bin ownership),
half-open edge conventions, the two-sided eager volume guard, and the
auto bin-width selection respecting max_explode on adversarial length
mixes."""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.rangejoin import (
    _auto_bin_us,
    interval_overlap_join,
    interval_point_join,
)
from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded

_T0 = datetime.datetime(2024, 1, 1)


def _ts(us: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(microseconds=us)


def _iv_df(spark, rows, prefix):
    """rows = [(id, start_us, end_us)] -> DataFrame with timestamp
    interval columns named {prefix}_id/{prefix}_s/{prefix}_e."""
    return spark.createDataFrame(
        [(i, _ts(s), _ts(e)) for i, s, e in rows],
        f"{prefix}_id bigint, {prefix}_s timestamp, {prefix}_e timestamp",
    )


def _brute(lrows, rrows):
    """Half-open overlap pairs by definition: ls < re AND rs < le,
    empty intervals excluded."""
    return {
        (li, ri)
        for li, ls, le in lrows
        if le > ls
        for ri, rs, re in rrows
        if re > rs and ls < re and rs < le
    }


def _run(spark, lrows, rrows, bin_us):
    got = interval_overlap_join(
        _iv_df(spark, lrows, "l"),
        _iv_df(spark, rrows, "r"),
        left_start="l_s",
        left_end="l_e",
        right_start="r_s",
        right_end="r_e",
        bin_us=bin_us,
    ).collect()
    pairs = [(r["l_id"], r["r_id"]) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


SEC = 1_000_000


@pytest.mark.parametrize("bin_us", [SEC, 7 * SEC, 60 * SEC, 9973 * 1000])
def test_matches_brute_force_random(spark, bin_us):
    """Random intervals both sides, four bin widths including
    misaligned primes — result equals the quadratic definition."""
    rng = random.Random(42)
    lrows = [
        (i, s := rng.randrange(0, 3600 * SEC), s + rng.randrange(0, 600 * SEC))
        for i in range(60)
    ]
    rrows = [
        (i, s := rng.randrange(0, 3600 * SEC), s + rng.randrange(0, 900 * SEC))
        for i in range(40)
    ]
    want = _brute(lrows, rrows)
    assert want, "degenerate fixture"
    assert _run(spark, lrows, rrows, bin_us) == want


def test_half_open_edges(spark):
    """Touching intervals ([0,10) vs [10,20)) do NOT overlap; empty
    intervals (end == start) match nothing; 1 µs intervals do match."""
    lrows = [(1, 0, 10), (2, 10, 10), (3, 15, 16)]
    rrows = [(1, 10, 20), (2, 0, 100), (3, 15, 16)]
    want = _brute(lrows, rrows)
    assert (1, 1) not in want and (2, 2) not in want
    assert (3, 3) in want and (3, 2) in want
    for bin_us in (1, 3, 64):
        assert _run(spark, lrows, rrows, bin_us) == want


def test_pair_spanning_many_shared_bins_counted_once(spark):
    """Two long co-extensive intervals share every bin — ownership must
    collapse them to ONE output row."""
    lrows = [(1, 0, 1000 * SEC)]
    rrows = [(1, 500 * SEC, 1500 * SEC)]
    assert _run(spark, lrows, rrows, 10 * SEC) == {(1, 1)}


def test_guard_covers_both_sides(spark):
    """The eager volume guard sums the predicted explode of BOTH
    sides: a huge fan-out on the RIGHT side alone must trip it."""
    lrows = [(1, 0, 10)]
    rrows = [(1, 0, 3600 * SEC)]  # 3600 bins at 1 s width
    with pytest.raises(CandidateVolumeExceeded, match="both\\s+sides"):
        interval_overlap_join(
            _iv_df(spark, lrows, "l"),
            _iv_df(spark, rrows, "r"),
            left_start="l_s",
            left_end="l_e",
            right_start="r_s",
            right_end="r_e",
            bin_us=SEC,
            max_explode=100,
        )


def test_auto_bin_respects_max_explode_adversarial_mix(spark):
    """Adversarial length mix — one giant interval among many tiny
    ones drags Σ len far above n · median, so the naive median width
    would blow the guard; the auto width must rise to satisfy it."""
    rng = random.Random(7)
    rows = [(i, s := rng.randrange(0, 10**9), s + 1000) for i in range(200)]
    rows.append((999, 0, 10**12))  # the giant: 1e12 µs long
    df = _iv_df(spark, rows, "l")
    max_explode = 1000
    bin_us = _auto_bin_us([(df, "l_s", "l_e")], max_explode)
    predicted = df.select(
        (
            (F.unix_micros("l_e") - 1)
            - (F.unix_micros("l_e") - 1) % bin_us
            - (F.unix_micros("l_s") - F.unix_micros("l_s") % bin_us)
        ).alias("span")
    ).agg(
        F.sum(F.expr(f"span div {bin_us} + 1")).alias("v")
    ).collect()[0]["v"]
    assert predicted <= max_explode
    # and the join itself runs without tripping its guard
    interval_overlap_join(
        df,
        _iv_df(spark, [(1, 0, 2000)], "r"),
        left_start="l_s",
        left_end="l_e",
        right_start="r_s",
        right_end="r_e",
        max_explode=max_explode + 4,  # + right side's own bins
    ).collect()


def test_auto_bin_refuses_impossible_budget(spark):
    """The true floor is ONE bin per interval: max_explode below n is
    refused eagerly, not discovered as OOM."""
    rows = [(i, i * 100, i * 100 + 50) for i in range(100)]
    with pytest.raises(CandidateVolumeExceeded, match="at ANY bin width"):
        _auto_bin_us([(_iv_df(spark, rows, "l"), "l_s", "l_e")], 99)


def test_auto_bin_tight_budget_degrades_to_wide_bins(spark):
    """n ≤ max_explode ≤ 2n (the analytic Σ(len/b + 2) bound can't
    certify it): the width degrades to the whole time extent, every
    interval lands in ONE bin, the exact Σ-bins guard passes, and the
    join result is unchanged (bin width is never a semantics knob)."""
    rows = [(i, i * 100, i * 100 + 50) for i in range(100)]
    df = _iv_df(spark, rows, "l")
    bin_us = _auto_bin_us([(df, "l_s", "l_e")], 150)
    n_bins = df.select(
        (
            (F.unix_micros("l_e") - 1)
            - (F.unix_micros("l_e") - 1) % bin_us
            - (F.unix_micros("l_s") - F.unix_micros("l_s") % bin_us)
        ).alias("span")
    ).agg(F.sum(F.expr(f"span div {bin_us} + 1")).alias("v")).collect()[0]["v"]
    assert n_bins == 100  # one bin each
    rrows = [(j, j * 300, j * 300 + 120) for j in range(40)]
    got = interval_overlap_join(
        df, _iv_df(spark, rrows, "r"),
        left_start="l_s", left_end="l_e",
        right_start="r_s", right_end="r_e",
        max_explode=150 + 80,  # + right side's own bins
    ).collect()
    pairs = {(r["l_id"], r["r_id"]) for r in got}
    assert len(got) == len(pairs)
    assert pairs == _brute(rows, rrows)


def test_point_join_auto_bin_matches_explicit(spark):
    """interval_point_join with bin_us=None returns the same rows as
    any explicit width (bin width is a performance knob, never a
    semantics knob)."""
    rng = random.Random(5)
    ivs = [
        (i, s := rng.randrange(0, 3600 * SEC), s + rng.randrange(1, 600 * SEC))
        for i in range(30)
    ]
    pts = [(i, rng.randrange(0, 4000 * SEC)) for i in range(300)]
    iv_df = _iv_df(spark, ivs, "l")
    pt_df = spark.createDataFrame(
        [(i, _ts(u)) for i, u in pts], "p_id bigint, p_ts timestamp"
    )
    def pairs(bin_us):
        return {
            (r["p_id"], r["l_id"])
            for r in interval_point_join(
                pt_df, iv_df, point_ts="p_ts", start_ts="l_s",
                end_ts="l_e", bin_us=bin_us,
            ).collect()
        }
    auto = pairs(None)
    assert auto == pairs(60 * SEC) == pairs(9973 * 1000)
    assert auto  # non-degenerate


def _us_of(ts):
    return (ts - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
        microseconds=1
    )


def _py_session_burst_overlap(events):
    """Pure-Python replica of the face, straight from the definitions
    (independent of BOTH the Spark plan and the DuckDB oracle — the
    r09 'an oracle by the same hand can share the bug' lesson):
    events = (user_id, ts_us, event_id)."""
    HOUR = 3_600_000_000
    # burst islands: above-mean error-hours happen on the caller side
    # (this replica receives ALL events and filters)
    err_hours: dict[int, int] = {}
    for _, t, _, et in events:
        if et == "error":
            h = t - t % HOUR
            err_hours[h] = err_hours.get(h, 0) + 1
    total = sum(err_hours.values())
    busy = sorted(h for h, c in err_hours.items() if c * 720 > total)
    bursts = []  # [start_us, end_us)
    for h in busy:
        if bursts and h == bursts[-1][1]:
            bursts[-1][1] = h + HOUR
        else:
            bursts.append([h, h + HOUR])
    # sessions: 30-min whole-second gap rule per user, half-open +1 µs
    by_user: dict[int, list] = {}
    for u, t, eid, _ in events:
        by_user.setdefault(u, []).append((t, eid))
    sessions = []  # (user, start_us, end_us)
    for u, evs in by_user.items():
        evs.sort()
        start = prev = evs[0][0]
        for t, _ in evs[1:]:
            if t // 1_000_000 - prev // 1_000_000 > 1800:
                sessions.append((u, start, prev + 1))
                start = t
            prev = t
        sessions.append((u, start, prev + 1))
    out = {}
    for bs, be in bursts:
        n_sessions = n_us = 0
        users = set()
        for u, ss, se in sessions:
            if ss < be and bs < se:
                n_sessions += 1
                users.add(u)
                n_us += min(be, se) - max(bs, ss)
        out[(bs, be)] = (n_sessions, len(users), n_us)
    return out


def test_face_matches_python_replica(spark, sf_dir):
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    events = [
        (r["user_id"], _us_of(r["ts"]), r["event_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ]
    want = _py_session_burst_overlap(events)
    got = {
        (_us_of(r["start_ts"]), _us_of(r["end_ts"])): (
            r["n_sessions"],
            r["n_users"],
            r["overlap_us"],
        )
        for r in QUERIES["session_burst_overlap"](spark, sf_dir).collect()
    }
    assert want, "degenerate fixture: no bursts"
    assert got == want


def test_auto_bin_tight_budget_pre_epoch_timestamps(spark):
    """Genuinely negative unix-µs (pre-1970) intervals through the
    tight-budget wide-bin path: the extent uses |min_start| too, so
    every interval still lands in the single bin containing 0 (Spark's
    sign-of-dividend %: x − x % b == 0 for |x| < b) and brute-force
    equality holds."""
    epoch = datetime.datetime(1970, 1, 1)

    def _pre(us):  # absolute timestamp at negative unix-µs
        return epoch + datetime.timedelta(microseconds=us)

    lrows = [(i, -5_000_000 + i * 1000, -5_000_000 + i * 1000 + 400)
             for i in range(30)]
    rrows = [(j, -5_000_000 + j * 2500, -5_000_000 + j * 2500 + 900)
             for j in range(12)]
    ldf = spark.createDataFrame(
        [(i, _pre(s), _pre(e)) for i, s, e in lrows],
        "l_id bigint, l_s timestamp, l_e timestamp",
    )
    rdf = spark.createDataFrame(
        [(j, _pre(s), _pre(e)) for j, s, e in rrows],
        "r_id bigint, r_s timestamp, r_e timestamp",
    )
    got = interval_overlap_join(
        ldf, rdf,
        left_start="l_s", left_end="l_e",
        right_start="r_s", right_end="r_e",
        max_explode=2 * (30 + 12) - 1,  # force the wide-bin path
    ).collect()
    pairs = {(r["l_id"], r["r_id"]) for r in got}
    assert len(got) == len(pairs)
    want = _brute(lrows, rrows)
    assert want and pairs == want
