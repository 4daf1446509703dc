"""Stream-static join: a streaming event source enriched against a
static dimension DataFrame — the remaining core Structured Streaming
join mode (windows, dedup, and stateful ops are covered elsewhere).
The static side is re-planned per micro-batch by Spark; the joined
result must equal the batch twin on the same bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
)


def _user_dim(spark):
    """Static per-user dimension (tier by id range)."""
    return spark.range(0, 1000).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold")
        .when(F.col("id") % 3 == 1, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )


def _enrich(events, dim):
    """Shared builder (batch or stream): join + per-tier agg."""
    joined = events.join(F.broadcast(dim), "user_id", "left")
    if events.isStreaming:
        joined = joined.withWatermark("ts", "1 hour")
        return joined.groupBy("tier", "event_type").agg(
            F.count(F.lit(1)).alias("n_events")
        )
    return joined.groupBy("tier", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


def test_stream_static_join_equals_batch(spark, sf_dir):
    dim = _user_dim(spark)
    stream_out = run_stream_to_memory(
        _enrich(read_events_stream(spark, sf_dir), dim),
        "enrich_out",
        mode="complete",
    )
    got = {
        (r.tier, r.event_type): r.n_events for r in stream_out.collect()
    }

    from bigdatamlteamrepo_spark.catalog import load_table

    batch = _enrich(load_table(spark, sf_dir, "events"), dim)
    want = {(r.tier, r.event_type): r.n_events for r in batch.collect()}
    assert got == want and got
