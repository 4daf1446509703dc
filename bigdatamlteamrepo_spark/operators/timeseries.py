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

    Output: (key, bucket_ts, value, is_observed).
    """
    bucket = F.date_trunc("hour", F.col(ts_col))
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
