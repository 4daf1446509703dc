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

from bigdatamlteamrepo_spark.queries.registry import PRI_NEW, query
from bigdatamlteamrepo_spark.sources.multimodal import (
    decode_media_exact_stats,
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


#: oracle twin of multimodal_decode_summary: reproduces the decode
#: stats ANALYTICALLY from the closed-form synthesis (codecs.py
#: synth_image/synth_audio + the PPM/WAV byte layouts) — pure SQL over
#: generated series, no media table needed.  Engine agreement proves
#: the encode → binary column → mapInPandas decode round-trip exactly.
_MM_DECODE_ORACLE = """
WITH ids AS (SELECT range AS mid FROM range(120)),
img AS (
  SELECT mid, 32 + (mid*7+42)%97 AS w, 32 + (mid*11+42)%73 AS h
  FROM ids WHERE (mid+42)%2 = 0
),
pxx AS (SELECT mid, h, unnest(range(w)) AS x FROM img),
px AS (
  SELECT mid,
         ((x*((mid+1)%7+1) + y*((mid+2)%5+1) + mid) % 256) AS r,
         ((x*((mid+3)%7+1) + y*((mid+5)%5+1) + mid*2) % 256) AS g,
         ((x*((mid+5)%7+1) + y*((mid+8)%5+1) + mid*3) % 256) AS b
  FROM (SELECT mid, x, unnest(range(h)) AS y FROM pxx)
),
img_per AS (
  SELECT mid, SUM((2*r + 5*g + b) // 8) AS luma_sum FROM px GROUP BY mid
),
img_stats AS (
  SELECT 'image' AS kind,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(9 + length(CAST(i.w AS VARCHAR))
                  + length(CAST(i.h AS VARCHAR)) + 3*i.w*i.h) AS BIGINT)
             AS total_bytes,
         CAST(SUM(i.w*i.h) AS BIGINT) AS total_px,
         CAST(SUM(ip.luma_sum) AS BIGINT) AS luma_sum,
         CAST(NULL AS BIGINT) AS total_samples,
         CAST(NULL AS BIGINT) AS sum_sq,
         CAST(NULL AS BIGINT) AS zero_crossings
  FROM img i JOIN img_per ip USING (mid)
),
aud AS (
  SELECT mid, 2000 + (mid*13+42)%8000 AS n,
         (mid%37)+20 AS p1, (mid%53)+40 AS p2
  FROM ids WHERE (mid+42)%2 = 1
),
smp AS (
  SELECT mid, t,
         (CASE WHEN (t // p1) % 2 = 0 THEN 8000 ELSE -8000 END
          + CASE WHEN (t // p2) % 2 = 0 THEN 4000 ELSE -4000 END) AS x
  FROM (SELECT mid, p1, p2, unnest(range(n)) AS t FROM aud)
),
smp2 AS (
  SELECT mid, x, LAG(x) OVER (PARTITION BY mid ORDER BY t) AS px FROM smp
),
aud_per AS (
  SELECT mid, CAST(COUNT(*) AS BIGINT) AS n_samples,
         SUM(CAST(x AS BIGINT)*x) AS sum_sq,
         SUM(CASE WHEN px IS NOT NULL AND (x < 0) <> (px < 0)
                  THEN 1 ELSE 0 END) AS zc
  FROM smp2 GROUP BY mid
),
aud_stats AS (
  SELECT 'audio' AS kind,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(44 + 2*a.n) AS BIGINT) AS total_bytes,
         CAST(NULL AS BIGINT) AS total_px,
         CAST(NULL AS BIGINT) AS luma_sum,
         CAST(SUM(ap.n_samples) AS BIGINT) AS total_samples,
         CAST(SUM(ap.sum_sq) AS BIGINT) AS sum_sq,
         CAST(SUM(ap.zc) AS BIGINT) AS zero_crossings
  FROM aud a JOIN aud_per ap USING (mid)
)
SELECT * FROM img_stats UNION ALL SELECT * FROM aud_stats
"""


@query("multimodal_decode_summary", oracle=_MM_DECODE_ORACLE, priority=PRI_NEW)
def multimodal_decode_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind EXACT-INTEGER decode summary over the real-codec media
    table — the multimodal tier's oracle-paired face (VERDICT_r6 #5).

    The engine decodes stored PPM/WAV bytes (mapInPandas over the
    binary column); the oracle computes the same statistics in closed
    form from the synthesis definition.  A hash match therefore pins
    the whole chain: executor-side synthesis → encoder → binary column
    → batch shapes → decoder → integer stats.  All BIGINT — no float
    comparator tolerance anywhere."""
    media = generate_decodable_media(spark, n_rows=120, seed=42)
    ex = decode_media_exact_stats(media)
    return ex.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("total_px").cast("bigint").alias("total_px"),
        F.sum("luma_sum").cast("bigint").alias("luma_sum"),
        F.sum("n_samples").cast("bigint").alias("total_samples"),
        F.sum("sum_sq").cast("bigint").alias("sum_sq"),
        F.sum("zero_crossings").cast("bigint").alias("zero_crossings"),
    )
