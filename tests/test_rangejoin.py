"""Binned interval-point join: brute-force containment equality across
bin widths (including widths that misalign with every interval),
half-open boundary semantics, overlap multiplicity, the volume guard,
and the burst face's island invariants."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from bigdatamlteamrepo_spark.operators.rangejoin import interval_point_join
from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded

_T0 = dt.datetime(2024, 5, 1)


def _ts(sec: float) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=sec)


def _pts_df(spark, secs):
    return spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate(secs)], "pid bigint, pts timestamp"
    )


def _iv_df(spark, spans):
    return spark.createDataFrame(
        [(j, _ts(a), _ts(b)) for j, (a, b) in enumerate(spans)],
        "ivid bigint, start_ts timestamp, end_ts timestamp",
    )


def _brute(secs, spans):
    return sorted(
        (i, j)
        for i, s in enumerate(secs)
        for j, (a, b) in enumerate(spans)
        if a <= s < b
    )


@pytest.mark.parametrize("bin_s", [1, 7, 100, 10_000])
def test_matches_brute_force_across_bin_widths(spark, bin_s):
    """The bin width must be a pure performance knob: identical matches
    at 1 s, a misaligned prime 7 s, and widths larger than any span."""
    rng = random.Random(17)
    secs = [rng.uniform(0, 500) for _ in range(60)]
    spans = []
    for _ in range(12):
        a = rng.uniform(0, 480)
        spans.append((a, a + rng.uniform(0.5, 90)))  # overlaps happen
    got = sorted(
        (r["pid"], r["ivid"])
        for r in interval_point_join(
            _pts_df(spark, secs),
            _iv_df(spark, spans),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=bin_s * 1_000_000,
        ).collect()
    )
    assert got == _brute(secs, spans)


def test_half_open_boundaries(spark):
    """start included, end excluded — and a point on a bin edge still
    matches (the bin of end−1µs covers it)."""
    spans = [(10.0, 20.0)]
    secs = [10.0, 19.999999, 20.0, 9.999999]
    got = sorted(
        r["pid"]
        for r in interval_point_join(
            _pts_df(spark, secs),
            _iv_df(spark, spans),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=10 * 1_000_000,
        ).collect()
    )
    assert got == [0, 1]


def test_overlapping_intervals_each_match_once(spark):
    spans = [(0.0, 100.0), (50.0, 60.0)]
    secs = [55.0]
    got = sorted(
        (r["pid"], r["ivid"])
        for r in interval_point_join(
            _pts_df(spark, secs),
            _iv_df(spark, spans),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=30 * 1_000_000,
        ).collect()
    )
    assert got == [(0, 0), (0, 1)]


def test_volume_guard_trips_on_narrow_bins(spark):
    """A year-long interval at 1 s bins predicts ~3.2e7 rows — over a
    1e6 cap the guard must refuse before any explode exists."""
    spans = [(0.0, 365 * 86_400.0)]
    with pytest.raises(CandidateVolumeExceeded):
        interval_point_join(
            _pts_df(spark, [1.0]),
            _iv_df(spark, spans),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=1_000_000,
            max_explode=1_000_000,
        )


def test_column_clash_rejected(spark):
    pts = _pts_df(spark, [1.0]).withColumnRenamed("pid", "ivid")
    with pytest.raises(ValueError, match="clash"):
        interval_point_join(
            pts,
            _iv_df(spark, [(0.0, 2.0)]),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=1_000_000,
        )


def test_burst_face_islands_are_maximal_disjoint(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = sorted(
        QUERIES["purchases_in_error_bursts"](spark, sf_dir).collect(),
        key=lambda r: r["start_ts"],
    )
    assert rows
    for r in rows:
        span_h = (r["end_ts"] - r["start_ts"]).total_seconds() / 3600
        assert span_h == r["n_hours"] >= 1
        assert r["start_ts"].minute == 0 and r["start_ts"].second == 0
        assert r["n_purchases"] >= 0
        assert (r["purchase_cents"] > 0) == (r["n_purchases"] > 0)
    for a, b in zip(rows, rows[1:]):
        # maximal runs: disjoint AND non-adjacent (adjacent would have
        # merged into one island)
        assert a["end_ts"] < b["start_ts"]


def test_empty_and_inverted_intervals_match_nothing(spark):
    """[s, s) and [s, e<s) can contain no point; they must be dropped
    cleanly, not crash sequence() with a descending range."""
    spans = [(10.0, 10.0), (30.0, 20.0), (5.0, 15.0)]
    got = sorted(
        (r["pid"], r["ivid"])
        for r in interval_point_join(
            _pts_df(spark, [10.0, 25.0]),
            _iv_df(spark, spans),
            point_ts="pts",
            start_ts="start_ts",
            end_ts="end_ts",
            bin_us=4_000_000,
        ).collect()
    )
    assert got == [(0, 2)]
