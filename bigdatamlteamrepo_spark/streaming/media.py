"""Streaming multimodal ingest: decode media payloads per micro-batch
and maintain a persisted per-item decode-stats table — the multimodal
tier composed with the exactly-once batch-scoped discipline of
streaming/ingest.py.

Why ``foreachBatch``: the decode is an Arrow-batched ``mapInPandas``
over a binary column (sources/multimodal.decode_media_exact_stats) —
a stateless per-row transform, so the streaming semantics reduce to
exactly-once APPEND of each micro-batch's stats.  That is precisely
the batch-scoped-overwrite-subdirectory pattern: every trigger writes
``stats/b<ns>-<batch_id>/`` with overwrite mode, so an at-least-once
replay of the same batch lands exactly once, and a restarted stream
with a fresh checkpoint gets its own namespace and can never clobber
an older run's contributions.

Scale: per-trigger cost is one decode pass over the batch (per-core
throughput in SCALING.md "media codec tier"); the stats table grows by
|batch| rows per trigger and is compacted by the SAME
``compact_ingest_indexes``-style fold discipline if needed — here the
per-batch subdirs are already row-scoped parquet, so a plain
periodic rewrite suffices and none is wired by default.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_exact_stats,
)
from bigdatamlteamrepo_spark.streaming.ingest import _batch_tag, _exists, _join


def decode_stats_batch(
    batch: DataFrame, stats_dir: str, batch_id: int, namespace: str = ""
) -> None:
    """Fold one micro-batch of media rows into the stats table: decode
    -> exact-integer stats -> OVERWRITE of the batch-scoped
    subdirectory (replay-idempotent)."""
    (
        decode_media_exact_stats(batch)
        .write.mode("overwrite")
        .parquet(_join(stats_dir, _batch_tag(batch_id, namespace)))
    )


def incremental_media_stream(
    stream_media: DataFrame, stats_dir: str, checkpoint_dir: str
):
    """Wire a streaming media source (MEDIA_SCHEMA rows) into the
    per-batch decode fold.  Returns the started query."""
    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _process(batch: DataFrame, batch_id: int) -> None:
        decode_stats_batch(batch, stats_dir, batch_id, namespace=ns)

    return (
        stream_media.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_media_stats(spark: SparkSession, stats_dir: str) -> DataFrame:
    """The maintained stats table: union of every batch subdirectory
    (recursive lookup, same read convention as the ingest tables)."""
    if not _exists(spark, stats_dir):
        from bigdatamlteamrepo_spark.sources.multimodal import (
            EXACT_STATS_SCHEMA,
        )

        return spark.createDataFrame([], EXACT_STATS_SCHEMA)
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(stats_dir)
    )
