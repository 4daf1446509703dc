"""Structured Streaming surface over event streams (SURVEY §2.9 / §7
step 7 — absent from the reference, required by the engine's north
star).

Design: every windowed aggregation is defined ONCE as a function of a
DataFrame — batch or streaming.  Spark's unified model makes the same
logical plan incrementalizable, so ``events_tumbling(batch_df)`` and
``events_tumbling(readStream_df)`` are the same code path; only the
sink differs.  The batch twins are what the DuckDB oracle checks
(queries/events.py); the streaming tests drive the same builders
through a file-source ``readStream`` with watermarks.

Late data: every streaming agg takes a watermark delay; events older
than the watermark are dropped by Spark (append mode) — the documented
late-data policy.  State size is bounded by (windows in watermark
horizon × keys), so these run indefinitely at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import TABLE_SCHEMAS
from bigdatamlteamrepo_spark.functions.numeric import dsum


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (parquet micro-batches).

    In production this is Kafka; the file source exercises the same
    incremental planner.  The ts-precision quirk (ns vs µs files across
    driver rounds) is handled as in the batch loader (catalog.py).
    """
    from bigdatamlteamrepo_spark.catalog import _PHYSICAL_SCHEMAS, events_ts_unit

    if events_ts_unit(f"{sf_dir}/events.parquet") == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # file-stream source requires a directory basePath; select the
        # single events file with a glob filter
        raw = (
            spark.readStream.schema(_PHYSICAL_SCHEMAS["events"])
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window count/sum per event type (batch or stream)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide wins)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of the
    batch lag/cumsum sessionize in queries/events.py."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def tumbling_hll_users(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
    p: int = 6,
) -> DataFrame:
    """Distinct users per tumbling window, estimated by a 2^p-register
    HyperLogLog folded into ONE aggregation (operators/sketches.py) —
    the shape Structured Streaming's single-aggregation rule demands.

    State per open window = 2^p small ints (the sketch's contract), vs
    the unbounded per-window user set an exact streaming distinct would
    hold.  The identical builder runs in batch (the oracle-paired
    hll_hourly_users query) and is the stream≡batch test subject.
    """
    from bigdatamlteamrepo_spark.operators.sketches import (
        h60,
        hll_agg_exprs,
        hll_agg_finalize,
    )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    h = h60(F.col("user_id"))
    regs = src.groupBy(F.window("ts", width).alias("win")).agg(
        F.count(F.lit(1)).alias("n_events"), *hll_agg_exprs(h, p)
    )
    return regs.select(
        F.col("win.start").alias("window_start"),
        "n_events",
        hll_agg_finalize(p).alias("approx_users"),
    )


def run_stream_to_memory(
    agg: DataFrame, name: str, mode: str = "append"
) -> "DataFrame":
    """Drive a streaming aggregation to completion against the bounded
    file source and return the materialized result (test/smoke sink).
    """
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")


def tumbling_cms_counters(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Count-min counter grid per tumbling window — the heavy-hitters
    sketch maintained over a stream.  Each event contributes one
    (depth, bucket) cell per hash row via a row-local 4-way posexplode,
    so the whole sketch is ONE legal streaming aggregation with state
    ≤ 4·1024 rows per open window (the CMS contract: memory independent
    of key cardinality — an exact streaming top-k would hold every
    distinct key).  The batch twin is operators/sketches.cms_counters
    grouped by the same window (pinned stream ≡ batch in
    tests/test_streaming_cms.py); estimates read the grid offline with
    the usual min-over-depths probe, inflate-only."""
    from bigdatamlteamrepo_spark.operators.sketches import (
        cms_bucket,
        cms_constants,
        h32,
    )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    h = h32(F.col(key))
    buckets = F.array(*[cms_bucket(h, a, b) for a, b in cms_constants()])
    return (
        src.select("ts", F.posexplode(buckets).alias("j", "bucket"))
        .groupBy(F.window("ts", width).alias("win"), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "j", "bucket", "cnt")
    )
