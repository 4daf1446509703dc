"""Stream ≡ batch for the incremental passage-dedup probe: the same
probe builder drives a file-source stream and a batch frame; rows must
be identical, and duplicated-passage detection must fire for docs that
replicate indexed content."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming.passages import (
    passage_index,
    probe_passage_index,
)


def test_probe_stream_equals_batch_and_detects_known(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    index = passage_index(docs).localCheckpoint(eager=True)

    # new batch: 3 docs copying indexed text under fresh ids (exact
    # passage hits) + 2 fresh docs that share no 20-token run
    base = docs.limit(3).collect()
    copies = [
        (100000 + i, r["source"], r["text"]) for i, r in enumerate(base)
    ]
    fresh = [
        (200000, "s_new", "alpha beta gamma"),
        (200001, "s_new", " ".join(f"tok{i}" for i in range(25))),
    ]
    batch = spark.createDataFrame(
        copies + fresh, "doc_id long, source string, text string"
    )
    src = tmp_path / "probe-src"
    batch.coalesce(1).write.parquet(str(src))

    want = sorted(
        map(tuple, probe_passage_index(batch, index).collect()), key=repr
    )

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        probe_passage_index(stream, index)
        .writeStream.format("memory")
        .queryName("passage_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM passage_probe").collect()),
        key=repr,
    )
    assert got == want

    out = spark.sql("SELECT * FROM passage_probe")
    # every passage of the copied docs is a known hit...
    hits = out.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000)
    assert hits.count() > 0
    assert hits.filter(~F.col("is_known")).count() == 0
    # ...and the fresh docs produce no false hits (the 3-token doc has
    # no full passage at all)
    assert out.filter(F.col("doc_id") >= 200000).filter(F.col("is_known")).count() == 0
