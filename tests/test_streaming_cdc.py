"""Unified batch/stream CDC compaction: the SAME compact_log function
driven through a file-source readStream (complete mode — per-key state
is one struct) must materialize exactly the batch result."""

from __future__ import annotations

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.cdc import compact_log
from bigdatamlteamrepo_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
)


def test_stream_compaction_equals_batch(spark, sf_dir):
    batch = compact_log(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        ),
        "user_id",
        "ts",
        "event_id",
        ["event_type", "value"],
    )
    stream = compact_log(
        read_events_stream(spark, sf_dir).select(
            "user_id", "ts", "event_id", "event_type", "value"
        ),
        "user_id",
        "ts",
        "event_id",
        ["event_type", "value"],
    )
    got = run_stream_to_memory(stream, "cdc_compacted", mode="complete")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert s == b and len(b) > 0
