"""Stream-stream interval join: streaming attribution equals the batch
interval join on the same bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming.joins import view_click_attribution
from bigdatamlteamrepo_spark.streaming.windows import read_events_stream


def _split(events):
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    return views, clicks


def test_stream_stream_join_equals_batch(spark, sf_dir):
    sv, sc = _split(read_events_stream(spark, sf_dir))
    q = (
        view_click_attribution(sv, sc)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.view_id, r.click_id)
        for r in spark.sql("SELECT view_id, click_id FROM attr_out").collect()
    }

    bv, bc = _split(load_table(spark, sf_dir, "events"))
    batch = view_click_attribution(bv, bc)
    want = {(r.view_id, r.click_id) for r in batch.collect()}
    assert want, "fixture must produce at least one attribution pair"
    assert got == want


def test_attribution_window_is_respected(spark, sf_dir):
    bv, bc = _split(load_table(spark, sf_dir, "events"))
    rows = view_click_attribution(bv, bc, within="30 minutes").collect()
    for r in rows:
        delta = (r.c_ts - r.v_ts).total_seconds()
        assert 0 < delta <= 1800, r
