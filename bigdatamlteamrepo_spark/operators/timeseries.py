"""Time-series regularization: resample an irregular event stream onto a
fixed grid with forward-fill (gap filling) — the standard prep step
before windowed feature extraction on sensor/metric data.

Plan shape: per-key hourly grid via ``sequence`` + ``explode`` (rows =
keys × grid points, generated distributively, no driver loop), left
join of observed buckets, then ``last(value, ignorenulls)`` over an
unbounded-preceding window for the fill.  One shuffle on the key; the
window scan is linear per key partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _step_seconds(step: str) -> int:
    """Parse ``"<n> <unit>"`` into seconds; reject variable-length units."""
    parts = step.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or int(parts[0]) < 1:
        raise ValueError(f"step must look like '15 minutes', got {step!r}")
    n, unit = int(parts[0]), parts[1].lower()
    if unit not in _UNIT_SECONDS:
        raise ValueError(
            f"unsupported step unit {unit!r}: months/years have variable "
            "length and cannot align a fixed epoch grid"
        )
    return n * _UNIT_SECONDS[unit]


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key fixed-grid resample: bucket observations (last value per
    bucket wins by latest ts, ties broken by ``id_col`` so the result is
    fully deterministic), expand each key's [min,max] bucket range onto
    the grid, forward-fill missing buckets.

    ``step`` accepts any ``"<n> <unit>"`` interval with a fixed length in
    seconds (seconds/minutes/hours/days/weeks).  Buckets are epoch-aligned
    (``floor(epoch / step) * step``) so every observation lands exactly on
    the grid the ``sequence`` generates — months/years (variable length)
    are rejected rather than silently misaligned.

    Output: (key, bucket_ts, value, is_observed).
    """
    step_secs = _step_seconds(step)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_secs) * step_secs
    )
    w_latest = Window.partitionBy(key_col, "bucket_ts").orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    observed = (
        events.withColumn("bucket_ts", bucket)
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .select(key_col, "bucket_ts", F.col(value_col).alias("obs_value"))
    )
    spans = observed.groupBy(key_col).agg(
        F.min("bucket_ts").alias("t0"), F.max("bucket_ts").alias("t1")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(observed, [key_col, "bucket_ts"], "left")
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.last("obs_value", ignorenulls=True).over(w_fill).alias("value"),
        F.col("obs_value").isNotNull().alias("is_observed"),
    )
