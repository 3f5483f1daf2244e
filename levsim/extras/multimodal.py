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


# --- real WAV codec (pure NumPy; RIFF/PCM 16-bit) ---------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """mono float samples in [-1, 1] -> 16-bit PCM WAV bytes."""
    import struct

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """16-bit PCM mono/stereo WAV bytes -> (sample_rate, float samples in
    [-1, 1]); stereo is averaged to mono.  Walks RIFF chunks, so extra
    chunks (LIST, fact, ...) are tolerated."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return rate, x


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """FEATURE_DIM floats from real samples: log duration, RMS,
    zero-crossing rate, peak (4) + RMS over 12 equal time slices."""
    x = np.asarray(samples, dtype=np.float64)
    n = max(len(x), 1)
    zc = float(np.count_nonzero(np.diff(np.signbit(x)))) / n if len(x) > 1 else 0.0
    head = [np.log1p(n / max(rate, 1)) / 8.0,
            float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
            zc,
            float(np.abs(x).max()) if len(x) else 0.0]
    slices = np.empty(FEATURE_DIM - 4, dtype=np.float64)
    for i in range(len(slices)):
        seg = x[i * n // len(slices): max((i + 1) * n // len(slices), i * n // len(slices) + 1)]
        slices[i] = np.sqrt(np.mean(seg**2)) if len(seg) else 0.0
    out = np.concatenate([head, slices]).astype(np.float32)
    assert out.shape == (FEATURE_DIM,)
    return out


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """FEATURE_DIM feature vector for an encoded audio payload.  Real path:
    16-bit PCM WAV via the pure-NumPy RIFF parser; other codecs need libs
    absent here (fake=True for the deterministic double)."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(*decode_wav(payload))
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "non-WAV audio decoding requires an audio library not present in "
        "this environment; pass fake=True for the deterministic test double"
    )


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
        decoders = {"image": decode_image, "audio": decode_audio}
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo: lo + batch_limit]
                feats = []
                shas = []
                nbytes = []
                for payload, kind in zip(chunk["payload"], chunk["kind"]):
                    b = bytes(payload) if payload is not None else b""
                    nbytes.append(len(b))
                    shas.append(hashlib.sha256(b).hexdigest())
                    dec = decoders.get(kind, decode_image)
                    feats.append(dec(b, fake=fake_decode).tolist())
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
    """Deterministic media table for tests: REAL payloads where the codec
    exists (BMP images, PCM WAV audio — both decode for real, no fake flag)
    and opaque bytes for video (decode stays stubbed)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            px = rng.randint(0, 256, size=(8 + i % 5, 6 + i % 7, 3), dtype=np.uint8)
            payload = encode_bmp(px)
            mime, w, h, dur = "image/bmp", px.shape[1], px.shape[0], None
        elif kind == "audio":
            t = np.arange(400 + 40 * (i % 8)) / 8000.0
            payload = encode_wav(np.sin(2 * np.pi * (200 + 20 * i) * t) * 0.7)
            mime, w, h, dur = "audio/wav", None, None, int(len(t) / 8)
        else:
            payload = bytes(rng.randint(0, 256, size=64 + (i % 128), dtype=np.uint8).tolist())
            mime, w, h, dur = "video/mp4", None, None, 3000
        rows.append((i, kind, payload, mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
