"""Multimodal registry entries: the media pipeline surfaced through the
driver contract.

The driver corpus has no media table, so the deterministic
expression-generated fixture (sources/multimodal.py, seed-fixed) stands
in — same rows every run, so the rows-only check is stable.  The decode
is a documented stub; the Spark plumbing (mapInPandas feature
extraction, frame expansion) is the real thing being exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_stats,
    extract_features,
    generate_decodable_media,
    generate_media,
    sample_frames,
)

_N_MEDIA = 300


@query("multimodal_feature_summary", priority=90)
def multimodal_feature_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = generate_media(spark, n_rows=_N_MEDIA, seed=42)
    feats = extract_features(media)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg(F.get("features", 0)).alias("mean_feat0"),
    )


@query("multimodal_decode_stats", priority=90)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path (PPM/WAV, sources/codecs.py): per-kind content
    statistics computed from actual pixels and samples — deterministic
    (integer synthesis + exact box math), so the rows-only check is
    stable across runs and partitionings."""
    media = generate_decodable_media(spark, n_rows=120, seed=42)
    stats = decode_media_stats(media)
    return stats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("mean_luma"), 6).alias("avg_luma"),
        F.round(F.avg("rms"), 6).alias("avg_rms"),
        F.sum("zero_crossings").alias("total_zero_crossings"),
    )


@query("multimodal_frame_counts", priority=90)
def multimodal_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = generate_media(spark, n_rows=_N_MEDIA, seed=42)
    frames = sample_frames(media, fps=1.0)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ms"),
    )
