#!/usr/bin/env python
"""Decode-throughput measurement for the real media codecs through the
actual Spark stages (mapInPandas over binary columns) — the scale
evidence for the r08 codec tier.

Measures, per codec, end-to-end wall for generate -> decode-stats
aggregate at increasing row counts, plus the pure-Python per-payload
decode rate outside Spark (the ceiling).  Records feed SCALING.md.

Usage: python tools/media_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bigdatamlteamrepo_spark import get_spark


def _pure_python_rates() -> None:
    from bigdatamlteamrepo_spark.sources.codecs import (
        decode_image,
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
        parse_mp4_frames,
        encode_mp4_skeleton,
        synth_image,
    )
    from bigdatamlteamrepo_spark.sources.jpeg import decode_jpeg, encode_jpeg

    img = synth_image(3, 128, 96)
    cases = {
        "ppm": (encode_ppm(img), decode_ppm),
        "png": (encode_png(img), decode_png),
        "jpeg_q90": (encode_jpeg(img, 90), decode_jpeg),
    }
    f = np.arange(240, dtype=np.int64)
    cases["mp4_tables"] = (
        encode_mp4_skeleton(
            (33 + (f // 8) % 3).astype(np.uint32),
            (100 + (f * 13) % 900).astype(np.uint32),
        ),
        parse_mp4_frames,
    )
    print("== pure-python per-payload decode (128x96 px / 240 frames) ==")
    for name, (payload, fn) in cases.items():
        n = 50 if name != "jpeg_q90" else 20
        t0 = time.perf_counter()
        for _ in range(n):
            fn(payload)
        dt = (time.perf_counter() - t0) / n
        mbs = len(payload) / dt / 1e6
        print(f"{name:<12} {dt*1000:7.2f} ms/payload  {len(payload):>7} B  {mbs:7.1f} MB/s")


def _spark_stage_walls(spark) -> None:
    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.sources.multimodal import (
        decode_media_exact_stats,
        generate_decodable_media,
        generate_jpeg_media,
        generate_png_media,
        generate_mp4_media,
        sample_frames_mp4,
    )

    stages = {
        "ppm+wav": lambda n: decode_media_exact_stats(
            generate_decodable_media(spark, n_rows=n)
        ).agg(F.sum("luma_sum")),
        "png": lambda n: decode_media_exact_stats(
            generate_png_media(spark, n_rows=n)
        ).agg(F.sum("luma_sum")),
        "jpeg": lambda n: decode_media_exact_stats(
            generate_jpeg_media(spark, n_rows=n)
        ).agg(F.sum("luma_sum")),
        "mp4_frames": lambda n: sample_frames_mp4(
            generate_mp4_media(spark, n_rows=n)
        ).agg(F.sum("frame_bytes")),
    }
    print("\n== Spark mapInPandas stage walls (generate+decode+agg) ==")
    print(f"{'stage':<12} {'rows':>6} {'wall_s':>8} {'rows/s':>8}")
    for name, fn in stages.items():
        fn(64).collect()  # warm codegen/arrow
        for n in (256, 1024):
            t0 = time.perf_counter()
            fn(n).collect()
            dt = time.perf_counter() - t0
            print(f"{name:<12} {n:>6} {dt:>8.2f} {n/dt:>8.0f}")


def main() -> None:
    _pure_python_rates()
    spark = get_spark(app_name="media-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    _spark_stage_walls(spark)
    spark.stop()


if __name__ == "__main__":
    main()
