"""Binned interval-point join: the range join Spark does not have.

``points.ts BETWEEN iv.start AND iv.end`` has no equi-key, so Spark
plans it as BroadcastNestedLoopJoin — O(|points| · |intervals|)
comparisons and a broadcast of whichever side is "small".  The standard
scale-out fix (DuckDB's IEJoin and Databricks' range-join hints do the
same under the hood) is BINNING: quantize time into fixed-width bins,
explode each interval onto every bin it overlaps, map each point to its
single bin, hash equi-join on the bin id, and post-filter the exact
containment predicate.

Cost model: shuffle volume is |points| + Σ_intervals (len/bin + 2) —
the bin width trades interval fan-out (wide bins → few copies) against
join selectivity (narrow bins → fewer false candidates for the
post-filter).  Callers pick the width near the TYPICAL interval
length; the volume guard refuses a fan-out past ``max_explode`` rather
than discovering it as an executor OOM (the setjoin contract).

Matches are exact and duplicate-free by construction: a point lives in
exactly ONE bin and an interval appears at most once per bin, so each
(point, interval) containment pair surfaces exactly once — no distinct
pass needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded

#: refuse interval explosions past this many (interval, bin) rows
MAX_EXPLODE = 50_000_000


def _us(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_us: int,
    max_explode: int = MAX_EXPLODE,
) -> DataFrame:
    """Half-open containment join: rows pair each ``points`` row with
    every ``intervals`` row where ``start ≤ ts < end``.  All three
    columns are timestamps; ``bin_us`` is the bin width in microseconds.
    Output carries all columns of both inputs (names must not clash).

    Raises :class:`CandidateVolumeExceeded` when the exact predicted
    explode volume Σ (bins per interval) exceeds ``max_explode`` — one
    bounded scalar aggregate, evaluated before any fan-out exists (the
    eager-guard contract of ``queries/linkpred.py``).
    """
    both = set(points.columns) | set(intervals.columns)
    clash = (set(points.columns) & set(intervals.columns)) | (
        {"__bin", "__b0", "__b1"} & both
    )
    if clash:
        raise ValueError(f"interval_point_join: column clash {sorted(clash)}")

    iv = intervals.filter(
        # empty/inverted [start, end) can match nothing — and would feed
        # sequence() a descending range, which Spark rejects outright
        _us(end_ts) > _us(start_ts)
    ).select(
        "*",
        (_us(start_ts) - _us(start_ts) % bin_us).alias("__b0"),
        # last bin START covering [start, end): bin of end - 1 µs
        ((_us(end_ts) - 1) - (_us(end_ts) - 1) % bin_us).alias("__b1"),
    )
    predicted = iv.agg(
        F.sum(F.expr(f"(__b1 - __b0) div {bin_us} + 1")).alias("v")
    ).collect()[0]["v"]
    if predicted is not None and predicted > max_explode:
        raise CandidateVolumeExceeded(
            f"predicted interval explode volume {int(predicted)} exceeds "
            f"{max_explode}; widen bin_us or pre-aggregate the intervals"
        )

    iv_binned = iv.select(
        *intervals.columns,
        F.explode(
            F.sequence("__b0", "__b1", F.lit(bin_us))
        ).alias("__bin"),
    )
    pt = points.select(
        "*", (_us(point_ts) - _us(point_ts) % bin_us).alias("__bin")
    )
    return (
        pt.join(iv_binned, "__bin")
        .filter(
            (_us(point_ts) >= _us(start_ts)) & (_us(point_ts) < _us(end_ts))
        )
        .drop("__bin")
    )
