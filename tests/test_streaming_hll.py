"""Streaming HLL: the single-aggregation sketch emits, through a real
watermark-driven stream, exactly the rows the batch twin computes."""

from __future__ import annotations

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming import windows as W


def test_hll_stream_equals_batch(spark, sf_dir):
    batch = {
        (r.window_start,): (r.n_events, r.approx_users)
        for r in W.tumbling_hll_users(load_table(spark, sf_dir, "events")).collect()
    }
    stream_src = W.read_events_stream(spark, sf_dir)
    assert stream_src.isStreaming
    streamed = W.run_stream_to_memory(
        W.tumbling_hll_users(stream_src), "hll_out", mode="append"
    )
    s = {
        (r.window_start,): (r.n_events, r.approx_users) for r in streamed.collect()
    }
    assert s, "stream emitted nothing"
    for key, val in s.items():
        assert batch[key] == val, key
    # append mode may withhold only the trailing unwatermarked windows
    assert len(s) >= len(batch) - 2


def test_hll_hourly_users_accuracy(spark, sf_dir):
    from pyspark.sql import functions as F

    est = W.tumbling_hll_users(load_table(spark, sf_dir, "events"))
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    joined = est.join(exact, "window_start").collect()
    assert joined
    # 64 registers → ~13% standard error; assert a generous 3σ envelope
    bad = [
        r
        for r in joined
        if abs(r.approx_users - r.exact_users) / max(r.exact_users, 1) > 0.4
    ]
    assert len(bad) <= max(1, len(joined) // 20), bad[:5]
