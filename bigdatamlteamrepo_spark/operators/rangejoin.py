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
length, or pass ``bin_us=None`` to derive it from the data: one
bounded aggregate per interval frame computes (count, Σ len, median
len) and the width becomes ``max(median_len, ceil(Σ len /
(max_explode − 2n)))`` — the median is the "typical length" heuristic,
the second term is the cost model solved for the smallest width that
keeps the predicted explode volume Σ (len/bin + 2) within
``max_explode``.  Either way the volume guard refuses a fan-out past
``max_explode`` rather than discovering it as an executor OOM (the
setjoin contract).

Matches are exact and duplicate-free by construction: a point lives in
exactly ONE bin and an interval appears at most once per bin, so each
(point, interval) containment pair surfaces exactly once — no distinct
pass needed.

:func:`interval_overlap_join` is the other half of what DuckDB's
IEJoin / Databricks range hints cover: two INTERVAL sets joined on
half-open overlap (``ls < re AND rs < le``).  Same binning design,
both sides explode; a pair sharing k bins would surface k times, so
exactly-once comes from FIRST-OVERLAP-BIN OWNERSHIP: the pair is kept
only in the bin containing ``max(ls, rs)`` — that instant lies inside
BOTH intervals whenever they overlap, so its bin is exploded by both
sides and the pair surfaces exactly once, with no distinct pass.  The
eager volume guard covers BOTH sides' fan-out.
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


def _auto_bin_us(
    iv_stats: list[tuple[DataFrame, str, str]], max_explode: int
) -> int:
    """Derive the bin width from the interval data (module docstring
    cost model): ONE bounded aggregate per interval frame computes
    (count, Σ len, median len, time extent); width = max over frames of
    the median length, raised if needed so the predicted explode volume
    Σ (len/bin + 2) stays within ``max_explode``.  When the budget is
    tighter than the analytic bound can certify (``max_explode ≤ 2n``)
    but still ≥ one bin per interval, the width degrades to the whole
    time extent — every interval then lands in a single bin (the join
    degenerates toward all-pairs, which is exactly what such a tight
    budget implies) and the exact Σ-bins count is n.

    Raises :class:`CandidateVolumeExceeded` only when ``max_explode``
    is below n itself — the true floor: Σ bins ≥ n at EVERY width,
    since each interval occupies at least one bin."""
    n_total = 0
    len_total = 0
    p50_max = 1
    extent = 1
    # one tagged union + ONE grouped aggregate + ONE bounded collect for
    # all sides (≤ |iv_stats| rows) — the per-side agg/collect pair ran
    # a sequential job per frame (r12, guide §2.4: the overlap join's
    # auto path paid two driver barriers where one suffices)
    tagged = None
    for i, (df, start, end) in enumerate(iv_stats):
        side = (
            df.select(
                (_us(end) - _us(start)).alias("__len"),
                _us(start).alias("__s"),
                _us(end).alias("__e"),
                F.lit(i).alias("__side"),
            )
            .filter(F.col("__len") > 0)
        )
        tagged = side if tagged is None else tagged.unionAll(side)
    if tagged is None:
        # no interval frames at all — degrade like the old per-frame
        # loop did on empty input (ADVICE_r12)
        return p50_max
    rows = (
        tagged.groupBy("__side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__len").alias("s"),
            F.percentile_approx("__len", 0.5).alias("p50"),
            F.min("__s").alias("lo"),
            F.max("__e").alias("hi"),
        )
        .collect()
    )
    for row in rows:
        n_total += row["n"] or 0
        len_total += row["s"] or 0
        p50_max = max(p50_max, int(row["p50"] or 1))
        if row["n"]:
            extent = max(extent, abs(int(row["lo"])), abs(int(row["hi"])))
    if n_total == 0:
        return p50_max
    if n_total >= max_explode:
        raise CandidateVolumeExceeded(
            f"{n_total} intervals need at least {n_total} "
            f"(interval, bin) rows at ANY bin width (one bin each), "
            f"exceeding max_explode={max_explode}; pre-aggregate the "
            "intervals"
        )
    if 2 * n_total >= max_explode:
        # analytic bound Σ(len/b + 2) can't certify this budget; a
        # width covering the whole time extent puts every interval in
        # the single bin containing 0 (x − x % b == 0 for |x| < b in
        # Spark's sign-of-dividend %), so exact Σ bins == n < budget
        return extent + 1
    floor_for_guard = -(-len_total // (max_explode - 2 * n_total))  # ceil
    return max(p50_max, int(floor_for_guard))


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_us: int | None = None,
    max_explode: int = MAX_EXPLODE,
) -> DataFrame:
    """Half-open containment join: rows pair each ``points`` row with
    every ``intervals`` row where ``start ≤ ts < end``.  All three
    columns are timestamps; ``bin_us`` is the bin width in microseconds
    — pass ``None`` (default) to derive it from the interval lengths
    via the module cost model (:func:`_auto_bin_us`; ONE bounded
    aggregate over the interval frame, which also certifies the volume
    bound, so the separate exact guard below is skipped on the auto
    path).  Output carries all columns of both inputs (names must not
    clash).

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
    auto = bin_us is None
    if auto:
        bin_us = _auto_bin_us(
            [(intervals, start_ts, end_ts)], max_explode
        )

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
    if not auto:
        # the auto path's width already certifies the bound (exact
        # Σ bins ≤ Σ(len/b) + 2n ≤ max_explode by construction), so the
        # exact-guard aggregate only runs for caller-chosen widths
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_us: int | None = None,
    max_explode: int = MAX_EXPLODE,
) -> DataFrame:
    """Half-open overlap join: rows pair each ``left`` interval with
    every ``right`` interval where ``[ls, le)`` and ``[rs, re)``
    intersect, i.e. ``ls < re AND rs < le``.  All four columns are
    timestamps; empty/inverted intervals (``end ≤ start``) overlap
    nothing and are dropped on both sides.  ``bin_us=None`` derives the
    width from BOTH sides' interval lengths (:func:`_auto_bin_us` —
    one bounded aggregate per side, which also certifies the volume
    bound, so the separate exact guard is skipped on the auto path).
    Output carries all columns of both inputs (names must not clash).

    Exactly-once without a distinct pass: a candidate pair surfaces in
    every shared bin, so the post-filter keeps it only in the bin that
    contains ``max(ls, rs)`` — the overlap's first instant, which lies
    inside both half-open intervals whenever they overlap, so exactly
    one shared bin owns each true pair (module docstring).

    Raises :class:`CandidateVolumeExceeded` when the exact predicted
    explode volume Σ (bins per interval) over BOTH sides exceeds
    ``max_explode`` — evaluated before any fan-out exists.
    """
    both = set(left.columns) | set(right.columns)
    clash = (set(left.columns) & set(right.columns)) | (
        {"__bin", "__b0", "__b1"} & both
    )
    if clash:
        raise ValueError(
            f"interval_overlap_join: column clash {sorted(clash)}"
        )
    auto = bin_us is None
    if auto:
        bin_us = _auto_bin_us(
            [(left, left_start, left_end), (right, right_start, right_end)],
            max_explode,
        )

    def _binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.filter(_us(end) > _us(start)).select(
            "*",
            (_us(start) - _us(start) % bin_us).alias("__b0"),
            ((_us(end) - 1) - (_us(end) - 1) % bin_us).alias("__b1"),
        )

    lb = _binned(left, left_start, left_end)
    rb = _binned(right, right_start, right_end)
    if not auto:
        # auto widths already certify the bound (see interval_point_join)
        predicted = sum(
            side.agg(
                F.sum(F.expr(f"(__b1 - __b0) div {bin_us} + 1")).alias("v")
            ).collect()[0]["v"]
            or 0
            for side in (lb, rb)
        )
        if predicted > max_explode:
            raise CandidateVolumeExceeded(
                f"predicted interval explode volume {int(predicted)} over "
                f"both sides exceeds {max_explode}; widen bin_us or "
                "pre-aggregate"
            )

    def _explode(df: DataFrame, cols: list[str]) -> DataFrame:
        return df.select(
            *cols,
            F.explode(F.sequence("__b0", "__b1", F.lit(bin_us))).alias(
                "__bin"
            ),
        )

    le_ = _explode(lb, left.columns)
    re_ = _explode(rb, right.columns)
    overlap_start = F.greatest(_us(left_start), _us(right_start))
    return (
        le_.join(re_, "__bin")
        .filter(
            (_us(left_start) < _us(right_end))
            & (_us(right_start) < _us(left_end))
            # first-overlap-bin ownership: exactly-once per true pair
            & (F.col("__bin") == overlap_start - overlap_start % bin_us)
        )
        .drop("__bin")
    )
