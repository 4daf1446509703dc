"""Incremental passage dedup for streaming ingest: new documents are
probed against a PERSISTED passage index via a stream-static join —
the O(batch) complement to the batch audit in queries/passages.py,
mirroring the incremental LSH probe (queries/text_dedup.py
neardup_incremental_lsh) at exact-passage granularity.

Scale shape: the index is (pkey, first_doc_id) — bounded by DISTINCT
passages, Zipf-collapsed, and served as a static parquet the stream
side equi-joins per micro-batch.  No corpus rescan ever happens; a new
batch costs its own passage explode plus one hash join against the
index.  The SAME builder runs in batch mode (``probe_passage_index``
takes any DataFrame), which is what the stream ≡ batch test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.passages import passage_keys


def passage_index(docs: DataFrame) -> DataFrame:
    """(pkey, first_doc_id): the persistable exact-passage index —
    min doc_id per distinct passage key.  Build once over the corpus,
    write to parquet, probe forever."""
    return passage_keys(docs).groupBy("pkey").agg(
        F.min("doc_id").alias("first_doc_id")
    )


def probe_passage_index(docs: DataFrame, index: DataFrame) -> DataFrame:
    """Per-passage probe rows (doc_id, source, pkey, known_doc_id,
    is_known) for a batch OR streaming ``docs`` frame.

    ``is_known`` flags passages whose exact token sequence already
    exists in the index under a DIFFERENT document — the signal an
    ingest pipeline uses to quarantine boilerplate before it reaches
    near-dup LSH.  Row-per-passage output keeps the streaming side
    aggregation-free (append mode, no watermark state); downstream
    audits aggregate per source/window as needed."""
    p = passage_keys(docs)
    idx = index.select("pkey", F.col("first_doc_id").alias("known_doc_id"))
    return p.join(idx, "pkey", "left").select(
        "doc_id",
        "source",
        "pkey",
        "known_doc_id",
        (
            F.col("known_doc_id").isNotNull()
            & (F.col("known_doc_id") != F.col("doc_id"))
        ).alias("is_known"),
    )
