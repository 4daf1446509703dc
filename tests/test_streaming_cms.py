"""Streaming count-min: the per-window counter grid maintained by the
stream must equal the batch builder cell-for-cell, and the estimates
probed from it must dominate true counts (CMS inflate-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    tumbling_cms_counters,
)


def test_stream_cms_equals_batch(spark, sf_dir):
    agg = tumbling_cms_counters(read_events_stream(spark, sf_dir))
    got = run_stream_to_memory(agg, "cms_stream", mode="complete")
    batch = tumbling_cms_counters(load_table(spark, sf_dir, "events"))
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, batch.collect()), key=repr
    )


def test_cms_estimates_dominate_truth(spark, sf_dir):
    from bigdatamlteamrepo_spark.operators.sketches import (
        cms_bucket,
        cms_constants,
        h32,
    )

    events = load_table(spark, sf_dir, "events")
    counters = tumbling_cms_counters(events)
    # probe one window's grid for every key seen in that window
    win = counters.select(F.min("window_start").alias("w")).collect()[0].w
    grid = counters.filter(F.col("window_start") == win)
    in_win = events.filter(
        (F.col("ts") >= win)
        & (F.col("ts") < F.lit(win) + F.expr("INTERVAL 1 HOUR"))
    )
    truth = in_win.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    kh = h32(F.col("user_id"))
    probes = truth.select(
        "user_id",
        "true_cnt",
        F.posexplode(
            F.array(*[cms_bucket(kh, a, b) for a, b in cms_constants()])
        ).alias("j", "bucket"),
    )
    est = (
        probes.join(F.broadcast(grid), ["j", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
        .collect()
    )
    assert est
    for r in est:
        assert r.cms_estimate >= r.true_cnt
