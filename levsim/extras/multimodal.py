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


# --- real BMP codec (pure NumPy; BITMAPINFOHEADER, 24-bit BI_RGB) ----------
# The one deterministic image format implementable without external libs:
# 14-byte file header + 40-byte info header + BGR rows padded to 4 bytes.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (bottom-up)."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8 RGB array")
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB.  Handles
    bottom-up (positive height) and top-down (negative) row order."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    need = data_off + row_len * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_len * h,
                         offset=data_off).reshape(h, row_len)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def image_features(pixels: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats from real pixels: per-channel mean/std in [-1, 1]
    (6), log-scaled dims (2), and a 2x4 grayscale grid of means (8)."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
    means = px.mean(axis=(0, 1)) / 127.5 - 1.0
    stds = px.std(axis=(0, 1)) / 127.5 - 1.0
    dims = [np.log1p(h) / 16.0, np.log1p(w) / 16.0]
    gray = px.mean(axis=2)
    grid = np.empty(8, dtype=np.float64)
    for gi in range(2):
        for gj in range(4):
            block = gray[gi * h // 2: max((gi + 1) * h // 2, gi * h // 2 + 1),
                         gj * w // 4: max((gj + 1) * w // 4, gj * w // 4 + 1)]
            grid[gi * 4 + gj] = block.mean() / 127.5 - 1.0
    out = np.concatenate([means, stds, dims, grid]).astype(np.float32)
    assert out.shape == (FEATURE_DIM,)
    return out


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """FEATURE_DIM feature vector for an encoded image payload.

    Real path: 24-bit BMP payloads are decoded with the pure-NumPy codec
    above and featurized from actual pixels.  Other formats (png/jpeg/...)
    need image libs absent from this container: pass ``fake=True`` for the
    deterministic content-derived test double, else NotImplementedError."""
    if len(payload) >= 2 and payload[:2] == b"BM":
        return image_features(decode_bmp(payload))
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "non-BMP image decoding requires an image library not present in "
        "this environment; pass fake=True for the deterministic test double"
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
