"""Watermark late-data policy, actually observed across restarts: run a
file-source stream to completion (watermark persisted in the checkpoint
commit log), then deliver a batch of events far older than the
committed watermark — the restarted query must drop them
(``numRowsDroppedByWatermark``) and never revise the emitted window.

Single-run note: under ``availableNow`` the operative watermark lags the
displayed one by a batch, so the two-run/checkpoint shape here is both
the production-faithful scenario and the deterministic one.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.streaming.windows import tumbling_counts

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_completion(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_counts(stream, width="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    progress = list(q.recentProgress)
    q.stop()
    return progress


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("latedata")
    return str(base / "src"), str(base / "ckpt"), str(base / "out")


def test_late_rows_dropped_after_committed_watermark(spark, dirs):
    src, ckpt, out = dirs
    os.makedirs(src, exist_ok=True)

    early = [(i, f"2024-01-01 05:{i:02d}:00", 1, "view", 1.0, "{}") for i in range(10)]
    advance = [(100 + i, f"2024-01-02 10:{i:02d}:00", 1, "view", 1.0, "{}") for i in range(5)]
    late = [(200 + i, "2024-01-01 05:30:00", 1, "view", 1.0, "{}") for i in range(7)]

    _mk_events(spark, early).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _mk_events(spark, advance).coalesce(1).write.mode("append").parquet(src)
    p1 = _run_to_completion(spark, src, ckpt, out)
    # run 1 ends with the watermark committed past the early window
    assert any(
        p["eventTime"].get("watermark", "").startswith("2024-01-02")
        for p in p1
    ), f"watermark did not advance: {[p['eventTime'] for p in p1]}"
    emitted = {
        (str(r.window_start), r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert ("2024-01-01 05:00:00", 10) in emitted

    # restart with 7 stragglers for the already-closed window
    _mk_events(spark, late).coalesce(1).write.mode("append").parquet(src)
    p2 = _run_to_completion(spark, src, ckpt, out)
    # NB: the metric counts rows AFTER map-side partial aggregation, so
    # the 7 late events surface as 1 dropped (pre-aggregated) state row
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in p2
        for so in p["stateOperators"]
    )
    assert dropped >= 1, f"late rows not dropped: {p2}"

    final = {}
    for r in spark.read.parquet(out).collect():
        final[str(r.window_start)] = final.get(str(r.window_start), 0) + r.n_events
    # the closed window was never revised; late rows created no output
    assert final["2024-01-01 05:00:00"] == 10
    assert sum(final.values()) == 10


def test_late_rows_kept_in_batch_mode(spark):
    """Control: the same data in BATCH mode counts all 22 rows — the
    drop above is the watermark's doing, not data loss."""
    early = [(i, "2024-01-01 05:05:00", 1, "view", 1.0, "{}") for i in range(10)]
    advance = [(100 + i, "2024-01-02 10:00:00", 1, "view", 1.0, "{}") for i in range(5)]
    late = [(200 + i, "2024-01-01 05:30:00", 1, "view", 1.0, "{}") for i in range(7)]
    df = _mk_events(spark, early + advance + late)
    out = {
        (str(r.window_start), r.event_type): r.n_events
        for r in tumbling_counts(df, width="1 hour").collect()
    }
    assert out[("2024-01-01 05:00:00", "view")] == 17  # early + late together
    assert sum(out.values()) == 22
