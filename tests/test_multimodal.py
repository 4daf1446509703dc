"""Multimodal plumbing tests: schema, batch shapes, determinism,
metadata-only pruning (the decode itself is a documented stub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.sources import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.generate_media(spark, n_rows=200, seed=42).cache()


def test_media_schema_and_metadata(media):
    assert [(f.name, f.dataType) for f in media.schema] == [
        (f.name, f.dataType) for f in mm.MEDIA_SCHEMA
    ]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # metadata nullity follows kind
    assert media.filter((F.col("kind") == "audio") & F.col("width").isNotNull()).count() == 0
    assert media.filter((F.col("kind") == "image") & F.col("duration_ms").isNotNull()).count() == 0
    assert media.filter(F.col("payload").isNull()).count() == 0


def test_extract_features_shapes(media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r.features) == 16
        assert all(0.0 <= v < 1.0 for v in r.features)
        assert r.n_bytes > 0
    # deterministic: same input → same features
    again = {r.media_id: r.features for r in mm.extract_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == r.features


def test_resize_images(media):
    resized = mm.resize_images(media, max_side=256).collect()
    originals = {r.media_id: r for r in media.filter(F.col("kind") == "image").collect()}
    assert len(resized) == len(originals)
    for r in resized:
        o = originals[r.media_id]
        assert max(r.width, r.height) <= 256
        # aspect ratio preserved within integer rounding
        if o.width >= o.height:
            assert r.width == min(256, o.width)
        # payload untouched by the stub
        assert bytes(r.payload) == bytes(o.payload)


def test_sample_frames(media):
    frames = mm.sample_frames(media, fps=1.0)
    per_video = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durs = {r.media_id: r.duration_ms for r in media.filter(F.col("kind") == "video").collect()}
    assert set(per_video) == set(durs)
    for mid, n in per_video.items():
        expected = len(range(0, durs[mid], 1000))
        assert n == expected
    # frame indices dense from 0
    one = min(per_video)
    idxs = [r.frame_idx for r in frames.filter(F.col("media_id") == one).orderBy("frame_idx").collect()]
    assert idxs == list(range(len(idxs)))


def test_metadata_query_prunes_payload(media, tmp_path):
    """Column pruning: a metadata-only aggregate over the parquet table
    must not read the payload column (ReadSchema check)."""
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    spark = media.sparkSession
    q = (
        spark.read.parquet(path)
        .groupBy("kind")
        .agg(F.avg("width").alias("avg_w"), F.count(F.lit(1)).alias("n"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, "payload column not pruned from scan"
    assert q.count() == 3
