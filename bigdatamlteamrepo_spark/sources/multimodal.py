"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

No media libraries ship in this container, so the *decode* step is a
deterministic stub (documented below); everything Spark-side — schema,
partition sizing, UDF signatures, batch shapes — is real and tested.
Swapping the stub for PIL/torchaudio/ffmpeg is a one-function change
that doesn't touch the plan.

Scale design:
  * payloads live in their own column so column pruning keeps metadata-
    only queries from ever reading bytes (parquet column chunks);
  * ``mapInPandas`` streams Arrow batches — peak executor memory is one
    batch of payloads, controlled by ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` (set small for MB-scale blobs);
  * feature extraction emits fixed-size float arrays → downstream is
    the similarity-search surface (queries/similarity.py).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),       # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()), # audio/video
        T.StructField("sample_rate", T.IntegerType()), # audio
    ]
)

_FEAT_DIM = 16


def generate_media(spark: SparkSession, n_rows: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload = seeded pseudo-random
    bytes whose length/metadata depend on kind.  Driver-side loop-free
    (expression-generated, like the other fixtures)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    df = spark.range(n_rows).withColumnRenamed("id", "media_id")
    ki = F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)).cast("int")
    # payload: sha2 chain of the id — opaque, deterministic, varying length
    payload = F.to_binary(
        F.repeat(F.sha2(F.concat(F.col("media_id").cast("string"), F.lit(seed)), 256),
                 (F.pmod(F.xxhash64("media_id", F.lit("len"), F.lit(seed)), F.lit(8)) + 2).cast("int")),
        F.lit("hex"),
    )
    h = lambda tag, mod, off: (F.pmod(F.xxhash64("media_id", F.lit(tag), F.lit(seed)), F.lit(mod)) + off).cast("int")
    return df.select(
        "media_id",
        F.get(kinds, ki).alias("kind"),
        payload.alias("payload"),
        F.get(mimes, ki).alias("mime"),
        F.when(F.get(kinds, ki) != "audio", h("w", 1920, 64)).alias("width"),
        F.when(F.get(kinds, ki) != "audio", h("h", 1080, 64)).alias("height"),
        F.when(F.get(kinds, ki) != "image", h("d", 60_000, 500)).alias("duration_ms"),
        F.when(F.get(kinds, ki) == "audio", F.lit(16_000)).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract / resize / frame-sample as mapInPandas stages
# ---------------------------------------------------------------------------


def _stub_decode(payload: bytes) -> np.ndarray:
    """STUB decode: real implementation would be PIL.Image.open /
    torchaudio.load / av.open.  Deterministic fake: digest bytes →
    fixed-length float32 'pixel' vector in [0, 1)."""
    dig = hashlib.sha256(payload).digest()
    vals = struct.unpack(">8I", dig[:32])
    return np.array([v % 10_000 for v in vals], dtype=np.float32) / 10_000.0


FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, features array<float>"
)


def extract_features(df: DataFrame) -> DataFrame:
    """payload → fixed-dim feature vector via mapInPandas (Arrow batches).

    Output feeds the embedding/similarity surface.  The per-batch loop
    is vectorized numpy over the decoded arrays; payload bytes never
    leave the executor.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                np.tile(_stub_decode(p), _FEAT_DIM // 8).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": pdf["payload"].map(lambda b: zlib.crc32(b)).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: recomputes metadata exactly; payload transform
    is the stub (real impl: PIL thumbnail).  Non-images pass through
    untouched upstream — filter before calling."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (max_side / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (pdf["width"] * scale).round().astype("int32"),
                    "height": (pdf["height"] * scale).round().astype("int32"),
                    "payload": pdf["payload"],  # STUB: bytes unchanged
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(op, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int"


def sample_frames(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame sampling: emits one row per sampled frame timestamp
    (1/fps seconds apart) — a row-expanding mapInPandas (UDTF shape).
    Real impl would attach decoded frame bytes per row."""
    step_ms = int(1000 / fps)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts = [], [], []
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                ts = list(range(0, int(dur), step_ms))
                out_id += [mid] * len(ts)
                out_idx += list(range(len(ts)))
                out_ts += ts
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_ts_ms": out_ts}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(op, schema=FRAMES_SCHEMA)
