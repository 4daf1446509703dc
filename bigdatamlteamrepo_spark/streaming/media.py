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

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_exact_stats,
    sample_frames_mp4,
)
from bigdatamlteamrepo_spark.streaming.ingest import _batch_tag, _exists, _join


def decode_stats_batch(
    batch: DataFrame, stats_dir: str, batch_id: int, namespace: str = ""
) -> None:
    """Fold one micro-batch of media rows into the maintained tables,
    routed BY KIND — MEDIA_SCHEMA's kind domain is image|audio|video
    and only the first two are per-payload decodable stats; video rows
    carry ISO BMFF containers whose frame tables go to the sibling
    ``frames/`` table (sample_frames_mp4).  Each write OVERWRITES its
    batch-scoped subdirectory (replay-idempotent); the frames write
    happens unconditionally so a replayed all-image batch still lands
    identically."""
    tag = _batch_tag(batch_id, namespace)
    (
        decode_media_exact_stats(batch.filter(F.col("kind") != "video"))
        .write.mode("overwrite")
        .parquet(_join(stats_dir, "stats", tag))
    )
    (
        sample_frames_mp4(batch)
        .write.mode("overwrite")
        .parquet(_join(stats_dir, "frames", tag))
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
    """The maintained image/audio stats table: union of every batch
    subdirectory (recursive lookup, the ingest-table read convention)."""
    from bigdatamlteamrepo_spark.sources.multimodal import EXACT_STATS_SCHEMA

    path = _join(stats_dir, "stats")
    if not _exists(spark, path):
        return spark.createDataFrame([], EXACT_STATS_SCHEMA)
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def read_media_frames(spark: SparkSession, stats_dir: str) -> DataFrame:
    """The maintained video frame table (one row per frame, parsed from
    the ISO BMFF sample tables at ingest time)."""
    from bigdatamlteamrepo_spark.sources.multimodal import MP4_FRAMES_SCHEMA

    path = _join(stats_dir, "frames")
    if not _exists(spark, path):
        return spark.createDataFrame([], MP4_FRAMES_SCHEMA)
    return spark.read.option("recursiveFileLookup", "true").parquet(path)
