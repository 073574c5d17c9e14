"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image``/``extract_features`` produce a
deterministic fake derived from the bytes' md5, clearly marked. The
Spark-side plumbing — schema, partition sizing, UDF signatures, Arrow
batch shapes — is real and tested; swapping the fake for PIL/ffmpeg is
a body-only change inside the kernel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),     # image|audio|video
    T.StructField("payload", T.BinaryType()),         # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    df = spark.range(n_rows).withColumnRenamed("id", "media_id")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("media-"), F.col("media_id").cast("string"),
                 F.lit("-"), F.md5(F.col("media_id").cast("string"))),
        "utf-8",
    )
    return df.select(
        "media_id",
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"), F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB — deterministic md5-derived feature vector in [0,1).
    Replace with a real decoder (PIL/torchvision/ffmpeg) off-container."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, vectorized
    kernel per batch. At scale: repartition upstream so each task holds
    ~(batch_size × payload) bytes; payloads never hit the driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (the
    decode itself is the stubbed kernel above). Demonstrates the
    explode-then-decode shape that keeps per-task memory bounded."""
    video = media.where(F.col("media_type") == "video")
    stamps = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return video.select(
        "media_id",
        F.explode(stamps).alias("ts_ms"),
        "payload",
    )
