"""Stream-stream joins: the attribution join (view → click within a
horizon) as a unified batch/stream builder.

Spark buffers both sides in watermarked state and emits matches as
they become provable; the time-interval condition bounds how long a
row can wait for its partner, so state size is
O(input-rate × horizon) — the contract that lets this run forever.
The same builder applied to two batch DataFrames is the ordinary
interval join, which is what the test compares against (stream ≡
batch on bounded input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Clicks attributed to the view they followed: same user, click
    inside ``(view_ts, view_ts + within]``.

    Streaming inputs get watermarks on BOTH sides (required for
    stream-stream state cleanup); the interval predicate gives Spark
    the bound it needs to expire view state after ``within`` past the
    watermark.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}"))
    )
    return v.join(c, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "v_ts", "c_ts"
    )
