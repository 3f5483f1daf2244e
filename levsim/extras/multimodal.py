"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
partition-preserving transforms.  The actual media decoding is STUBBED
(this container ships no image/audio libs): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
content-derived fake decode is produced so downstream plumbing (resize,
feature extraction, batch fan-out) can be exercised end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),     # typed metadata, nullable
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic content-derived pseudo-decode: expands the payload hash
    into a FEATURE_DIM float vector in [-1, 1].  Stands in for a real
    decode->model feature extractor; swap with a real implementation when
    media libs are available."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32 * 2.0 - 1.0).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real image decoding requires PIL/opencv (absent here)."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; pass fake=True for the deterministic test double"
    )


def extract_features(media: DataFrame, fake_decode: bool = True,
                     batch_limit: int = 256) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item content features via mapInPandas.

    Partition-preserving (no shuffle); Arrow batches are re-chunked to at
    most ``batch_limit`` rows so large binary payloads don't blow the
    executor-python transfer (the real concern at 100 TB: bound
    bytes-per-batch, not rows-per-batch)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo: lo + batch_limit]
                feats = []
                shas = []
                nbytes = []
                for payload in chunk["payload"]:
                    b = bytes(payload) if payload is not None else b""
                    nbytes.append(len(b))
                    shas.append(hashlib.sha256(b).hexdigest())
                    feats.append(decode_image(b, fake=fake_decode).tolist())
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": nbytes,
                        "sha256": shas,
                        "feature": feats,
                    }
                )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (pure column algebra — the decode itself is the stubbed part).
    Demonstrates the explode-based fan-out shape used for frame pipelines."""
    return (
        video.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                                 F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=64 + (i % 128), dtype=np.uint8).tolist())
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
