"""foreachBatch idempotent sink: epoch replay overwrites instead of
duplicating (the at-least-once → effectively-once recipe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.streaming import windows as W
from bigdatamlteamrepo_spark.streaming.sinks import (
    idempotent_parquet_writer,
    write_stream_idempotent,
)


def test_stream_writes_through_foreach_batch(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("fb")
    out, ckpt = str(base / "out"), str(base / "ckpt")
    agg = W.tumbling_counts(W.read_events_stream(spark, sf_dir))
    q = write_stream_idempotent(agg, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    batch = W.tumbling_counts(
        __import__("bigdatamlteamrepo_spark.catalog", fromlist=["load_table"]).load_table(
            spark, sf_dir, "events"
        )
    )
    # single availableNow epoch over a bounded source = full batch result
    a = {
        (str(r.window_start), r.event_type): r.n_events for r in got.collect()
    }
    b = {
        (str(r.window_start), r.event_type): r.n_events for r in batch.collect()
    }
    assert a == b
    assert set(got.select("batch_id").distinct().toPandas()["batch_id"]) == {0}


def test_epoch_replay_does_not_duplicate(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("replay") / "out")
    df1 = spark.range(10).select(F.col("id"), F.lit("a").alias("v"))
    df2 = spark.range(10, 15).select(F.col("id"), F.lit("b").alias("v"))
    writer = idempotent_parquet_writer(out)
    writer(df1, 0)
    writer(df2, 1)
    # crash-replay of epoch 1 with (possibly re-computed) same data
    writer(df2, 1)
    got = spark.read.parquet(out)
    assert got.count() == 15, "replay duplicated epoch 1"
    assert got.filter(F.col("batch_id") == 1).count() == 5
    # epoch 0 untouched by the replay (dynamic overwrite, not full truncate)
    assert got.filter(F.col("batch_id") == 0).count() == 10
