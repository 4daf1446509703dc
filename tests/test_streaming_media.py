"""Streaming multimodal ingest (streaming/media.py): stream-fed decode
stats must equal the one-shot batch computation — including video rows
routed to the frame table — replays must land exactly once, and
concurrent namespaces must not collide."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_exact_stats,
    generate_decodable_media,
    generate_jpeg_media,
    generate_mp4_media,
    generate_png_media,
    sample_frames_mp4,
)
from bigdatamlteamrepo_spark.streaming.media import (
    decode_stats_batch,
    incremental_media_stream,
    read_media_frames,
    read_media_stats,
)

_MEDIA_DDL = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, sample_rate int"
)


def _stats_rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "media_id", "kind", "total_px", "luma_sum", "n_samples",
            "sum_sq", "zero_crossings",
        ).collect()
    )


def _frame_rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "media_id", "frame_idx", "frame_ts_ms", "frame_bytes"
        ).collect()
    )


@pytest.fixture(scope="module")
def media_waves(spark):
    """Four media waves across codec tiers (PPM/WAV, PNG, JPEG, MP4)
    with disjoint id ranges — the MP4 wave exercises the video-kind
    routing that must NOT crash the stream."""
    w1 = generate_decodable_media(spark, n_rows=40, seed=42)
    w2 = generate_png_media(spark, n_rows=30, seed=42).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    w3 = generate_jpeg_media(spark, n_rows=30, seed=42).withColumn(
        "media_id", F.col("media_id") + 2000
    )
    w4 = generate_mp4_media(spark, n_rows=10, seed=42).withColumn(
        "media_id", F.col("media_id") + 3000
    )
    return [w.cache() for w in (w1, w2, w3, w4)]


def test_stream_equals_batch(spark, tmp_path, media_waves):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for w in media_waves:
        w.coalesce(1).write.mode("append").parquet(src)
    avs = media_waves[0].unionByName(media_waves[1]).unionByName(
        media_waves[2]
    )
    want_stats = _stats_rows(decode_media_exact_stats(avs))
    want_frames = _frame_rows(sample_frames_mp4(media_waves[3]))
    stats_dir = str(tmp_path / "stats")
    stream = (
        spark.readStream.schema(_MEDIA_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_media_stream(stream, stats_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert _stats_rows(read_media_stats(spark, stats_dir)) == want_stats
    assert _frame_rows(read_media_frames(spark, stats_dir)) == want_frames
    assert len(want_stats) == 100 and len(want_frames) > 0


def test_replay_lands_exactly_once(spark, tmp_path, media_waves):
    stats_dir = str(tmp_path / "replay_stats")
    decode_stats_batch(media_waves[1], stats_dir, batch_id=0, namespace="t")
    once = _stats_rows(read_media_stats(spark, stats_dir))
    # at-least-once replay of the SAME (namespace, batch): overwrite
    decode_stats_batch(media_waves[1], stats_dir, batch_id=0, namespace="t")
    assert _stats_rows(read_media_stats(spark, stats_dir)) == once
    # a different namespace with the same batch id adds, not clobbers
    decode_stats_batch(media_waves[2], stats_dir, batch_id=0, namespace="u")
    both = _stats_rows(read_media_stats(spark, stats_dir))
    assert len(both) == len(once) + media_waves[2].count()
    # mixed batch: video rows land in frames, never crash the fold
    mixed = media_waves[0].unionByName(media_waves[3])
    decode_stats_batch(mixed, stats_dir, batch_id=1, namespace="t")
    assert _frame_rows(read_media_frames(spark, stats_dir)) == _frame_rows(
        sample_frames_mp4(media_waves[3])
    )


def test_empty_stats_dir_reads_empty(spark, tmp_path):
    df = read_media_stats(spark, str(tmp_path / "nope"))
    assert df.count() == 0
    assert "luma_sum" in df.columns
    fr = read_media_frames(spark, str(tmp_path / "nope"))
    assert fr.count() == 0 and "frame_ts_ms" in fr.columns
