"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Decoding tiers:

- REAL stdlib decoders for container-friendly formats: WAV audio
  (``wave`` + ``struct``: sample rate, duration, per-window RMS energy +
  zero-crossing rate features) and 24-bit BMP images (``struct`` header
  parse, grid-pooled mean-RGB features — the "resize" step as average
  pooling).  These run end-to-end in this container, no PIL/cv2 needed.
- STUBS for codec formats (JPEG/PNG/MP4/...): raise
  ``NotImplementedError`` — real codecs need external libraries that are
  not in this environment.  ``fake_feature`` provides a deterministic
  stand-in so downstream stages (similarity, dedup) exercise the same
  plan shape.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
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


# ---------------------------------------------------------------------------
# Real encoders/decoders: WAV (stdlib wave) and 24-bit BMP (struct)
# ---------------------------------------------------------------------------

def make_wav(seed: int, sample_rate: int = 8000, n_samples: int = 400) -> bytes:
    """Deterministic mono 16-bit PCM WAV: a sine whose frequency and
    amplitude derive from the seed."""
    freq = 200 + (seed * 37) % 800
    amp = 8000 + (seed * 53) % 16000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_samples):
            v = int(amp * math.sin(2 * math.pi * freq * i / sample_rate))
            frames += struct.pack("<h", v)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """WAV → {sample_rate, n_channels, n_frames, duration_ms, samples}."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        ch = w.getnchannels()
        raw = w.readframes(n)
    samples = list(struct.unpack(f"<{n * ch}h", raw))
    return {"sample_rate": rate, "n_channels": ch, "n_frames": n,
            "duration_ms": int(n * 1000 / rate), "samples": samples}


def wav_feature(payload: bytes, n_windows: int = 8) -> list[float]:
    """Per-window RMS energy (normalized) + zero-crossing rate — the
    classic cheap audio descriptor, computed from real decoded PCM."""
    d = decode_wav(payload)
    s = d["samples"]
    if not s:
        return [0.0] * (n_windows + 1)
    win = max(1, len(s) // n_windows)
    feats = []
    for wi in range(n_windows):
        chunk = s[wi * win:(wi + 1) * win] or [0]
        rms = math.sqrt(sum(x * x for x in chunk) / len(chunk))
        feats.append(rms / 32768.0)
    zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
    feats.append(zc / max(1, len(s) - 1))
    return feats


def make_bmp(seed: int, width: int = 16, height: int = 16) -> bytes:
    """Deterministic 24-bit uncompressed BMP (BITMAPINFOHEADER)."""
    row_pad = (4 - (width * 3) % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):     # BMP rows bottom-up
        for x in range(width):
            r = (x * 13 + seed * 7) % 256
            g = (y * 29 + seed * 11) % 256
            b = ((x + y) * 31 + seed * 3) % 256
            body += struct.pack("<BBB", b, g, r)
        body += b"\x00" * row_pad
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


def decode_bmp(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """24-bit BMP → (width, height, row-major top-down RGB pixels)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP supported, got {bpp}")
    row_pad = (4 - (width * 3) % 4) % 4
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * abs(height))
    pos = data_off
    rows = range(abs(height) - 1, -1, -1) if height > 0 else range(abs(height))
    for y in rows:
        for x in range(width):
            b, g, r = struct.unpack_from("<BBB", payload, pos)
            pixels[y * width + x] = (r, g, b)
            pos += 3
        pos += row_pad
    return width, abs(height), pixels


def bmp_feature(payload: bytes, grid: int = 4) -> list[float]:
    """Grid-pooled mean RGB (the resize-to-grid step as average pooling):
    grid×grid×3 floats in [0,1], from really-decoded pixels."""
    w, h, px = decode_bmp(payload)
    feats = []
    for gy in range(grid):
        for gx in range(grid):
            xs = range(gx * w // grid, max(gx * w // grid + 1,
                                           (gx + 1) * w // grid))
            ys = range(gy * h // grid, max(gy * h // grid + 1,
                                           (gy + 1) * h // grid))
            n = rs = gs = bs = 0
            for y in ys:
                for x in xs:
                    r, g, b = px[y * w + x]
                    rs += r; gs += g; bs += b; n += 1
            feats += [rs / n / 255.0, gs / n / 255.0, bs / n / 255.0]
    return feats


def decode_image(payload: bytes) -> "object":
    """Codec image formats (JPEG/PNG/...) need pillow/opencv — not in
    this environment.  24-bit BMP decodes natively: use decode_bmp."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "JPEG/PNG decoding requires pillow/opencv — not in this "
        "environment; BMP decodes natively, or use fake_feature")


def fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic pseudo-feature from payload bytes: dim md5-derived
    floats in [0,1) — the stand-in for codec formats' decode→embed."""
    out = []
    for d in range(dim):
        h = hashlib.md5(payload + d.to_bytes(2, "big")).hexdigest()
        out.append(int(h[:8], 16) / 2 ** 32)
    return out


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------

def synthetic_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table: REAL WAV payloads for audio rows, REAL
    BMP payloads for image rows, seeded opaque bytes for video rows."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            payload = make_bmp(i)
            rows.append((i, kind, "image/bmp", 16, 16, None,
                         bytearray(payload)))
        elif kind == "audio":
            payload = make_wav(i)
            rows.append((i, kind, "audio/wav", None, None, 50,
                         bytearray(payload)))
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
            rows.append((i, kind, "video/x-fake", None, None,
                         1000 * (i % 7), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow
    plumbing with REAL decoders for wav/bmp mimes, deterministic fake for
    codec formats."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats, ids, sizes = [], [], []
            for mid, mime, payload in zip(pdf["media_id"], pdf["mime"],
                                          pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                ids.append(int(mid))
                sizes.append(len(b))
                if mime == "audio/wav":
                    feats.append(wav_feature(b))
                elif mime == "image/bmp":
                    feats.append(bmp_feature(b))
                else:
                    feats.append(fake_feature(b))
            yield pd.DataFrame({"media_id": ids, "feature": feats,
                                "n_bytes": sizes})

    return media.select("media_id", "mime", "payload") \
                .mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (native explode over the duration — the video decode itself is
    stubbed; no codec library in this container)."""
    frames = F.explode(F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms)))
    return (media.where(F.col("kind") == "video")
                 .select("media_id", frames.alias("frame_ts_ms")))
