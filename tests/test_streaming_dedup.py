"""Streaming ingest dedup: duplicate deliveries across micro-batches
are suppressed exactly once, and the streaming result equals the batch
twin on the same combined input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.streaming.dedup import dedup_events

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_stream_dedup_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    first = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "view", 1.0, "{}") for i in range(10)
    ]
    # re-delivery of ids 3..8 (identical rows) plus 5 genuinely new events
    redelivery = [first[i] for i in range(3, 9)] + [
        (20 + i, f"2024-01-01 10:2{i}:00", 2, "click", 2.0, "{}") for i in range(5)
    ]
    _mk(spark, first).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, redelivery).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        dedup_events(stream, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()

    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in got]
    assert sorted(ids) == sorted(set(ids)), "duplicate emission"
    assert set(ids) == set(range(10)) | {20, 21, 22, 23, 24}
    assert n_batches >= 2, "re-delivery must arrive in a later micro-batch"

    # batch twin on the same combined input
    batch = dedup_events(spark.read.schema(_SCHEMA).parquet(src))
    assert {r.event_id for r in batch.select("event_id").collect()} == set(ids)


def test_batch_dedup_is_plain_drop_duplicates(spark):
    df = _mk(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "view", 1.0, "{}"),
        ],
    )
    assert dedup_events(df).count() == 2
