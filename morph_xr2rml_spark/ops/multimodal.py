"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
image/audio libraries are not in this container.  Decoders raise
``NotImplementedError`` unless the deterministic fake is requested, which
produces reproducible pseudo-features so downstream stages (similarity,
dedup) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("payload", BinaryType(), True),    # opaque bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("n_bytes", IntegerType(), False),
])


def synthetic_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append((i, kind, f"application/x-fake-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 * (i % 7) if kind != "image" else None,
                     bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Real decode is unavailable in this container (no PIL/cv2)."""
    raise NotImplementedError(
        "image decoding requires pillow/opencv — not in this environment; "
        "use fake_feature for plumbing tests")


def fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic pseudo-feature from payload bytes: dim md5-derived
    floats in [0,1) — the stand-in for decode→embed."""
    out = []
    for d in range(dim):
        h = hashlib.md5(payload + d.to_bytes(2, "big")).hexdigest()
        out.append(int(h[:8], 16) / 2 ** 32)
    return out


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    Arrow plumbing (binary columns travel as bytes objects per batch)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats, ids, sizes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                ids.append(int(mid))
                sizes.append(len(b))
                feats.append(fake_feature(b))
            yield pd.DataFrame({"media_id": ids, "feature": feats,
                                "n_bytes": sizes})

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (native explode over the duration — the decode itself is stubbed)."""
    frames = F.explode(F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms)))
    return (media.where(F.col("kind") == "video")
                 .select("media_id", frames.alias("frame_ts_ms")))
