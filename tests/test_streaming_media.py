"""Streaming multimodal ingest (streaming/media.py): stream-fed decode
stats must equal the one-shot batch computation, replays must land
exactly once, and concurrent namespaces must not collide."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_exact_stats,
    generate_decodable_media,
    generate_jpeg_media,
    generate_png_media,
)
from bigdatamlteamrepo_spark.streaming.media import (
    decode_stats_batch,
    incremental_media_stream,
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


@pytest.fixture(scope="module")
def media_waves(spark):
    """Three media waves across codec tiers (PPM/WAV, PNG, JPEG) with
    disjoint id ranges."""
    w1 = generate_decodable_media(spark, n_rows=40, seed=42)
    w2 = generate_png_media(spark, n_rows=30, seed=42).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    w3 = generate_jpeg_media(spark, n_rows=30, seed=42).withColumn(
        "media_id", F.col("media_id") + 2000
    )
    return [w.cache() for w in (w1, w2, w3)]


def test_stream_equals_batch(spark, tmp_path, media_waves):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for w in media_waves:
        w.coalesce(1).write.mode("append").parquet(src)
    want = _stats_rows(
        decode_media_exact_stats(
            media_waves[0].unionByName(media_waves[1]).unionByName(
                media_waves[2]
            )
        )
    )
    stats_dir = str(tmp_path / "stats")
    stream = (
        spark.readStream.schema(_MEDIA_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_media_stream(stream, stats_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = _stats_rows(read_media_stats(spark, stats_dir))
    assert got == want
    assert len(got) == 100


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


def test_empty_stats_dir_reads_empty(spark, tmp_path):
    df = read_media_stats(spark, str(tmp_path / "nope"))
    assert df.count() == 0
    assert "luma_sum" in df.columns
