"""Rate-controlled multi-file streaming: processingTime trigger +
maxFilesPerTrigger — the ingestion pattern for backfilling a large
file backlog at bounded per-batch cost (NOTES_r1 item 5).

availableNow drains a source in one shot; production backfills instead
bound each micro-batch (files per trigger) and pace them (processing
interval) so state checkpoints stay small and downstream sinks see a
steady rate.  The test proves (a) every row arrives exactly once,
(b) the work actually split into multiple micro-batches.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table

N_FILES = 4


def test_processing_time_trigger_rate_control(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("evsrc"))
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    expected = ev.count()
    ev.repartition(N_FILES).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = "rate_controlled_events"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0].n
            if got >= expected:
                break
            time.sleep(0.5)
        got = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0].n
        assert got == expected  # exactly-once delivery of the whole backlog
        # rate control: the backlog split into >1 micro-batch (one per file
        # at maxFilesPerTrigger=1; data files land in >=2 batches)
        data_batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(data_batches) >= 2, [
            (p["batchId"], p["numInputRows"]) for p in q.recentProgress
        ]
        assert sum(p["numInputRows"] for p in data_batches) == expected
    finally:
        q.stop()
