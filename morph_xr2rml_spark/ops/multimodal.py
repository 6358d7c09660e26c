"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Decoding tiers:

- REAL stdlib decoders: WAV audio (``wave`` + ``struct``: sample rate,
  duration, per-window RMS energy + zero-crossing rate features),
  24-bit BMP images (``struct`` header parse), full-bit-depth PNG
  (1/2/4/8/16) incl. Adam7 interlace (``struct`` chunk walk + ``zlib`` inflate + per-row
  unfiltering, all five filter types), and baseline + progressive JPEG
  (ops/jpeg.py: huffman + DCT, spectral-selection/successive-
  approximation scans, 4:4:4 and 4:2:0 chroma subsampling).
  Image
  features are grid-pooled mean RGB — the "resize" step as average
  pooling.  These run end-to-end in this container, no PIL/cv2 needed.
- REAL video decode for MJPEG-in-AVI (``decode_avi_mjpeg``: RIFF chunk
  walk → per-frame baseline JPEG via ops/jpeg.py; ``video_feature`` =
  temporal mean of per-frame grid-pooled features).
- STUB for other video codecs (MP4/H.264/...): inter-frame codecs need
  external libraries that are not in this environment.  ``fake_feature``
  provides a deterministic stand-in so downstream stages (similarity,
  dedup) exercise the same plan shape; the production swap-in is ffmpeg
  under the same payload→frames contract.

PRODUCTION SWAP-IN BOUNDARY: the pure-Python decoders are the
correctness tier — they make the plumbing testable end-to-end in this
container, but per-pixel Python decode would be the bottleneck at
100 TB of images.  The swap-in point is ``decode_image`` /
``decode_wav`` (and the ``*_feature`` helpers built on them): a
production deployment replaces their bodies with PIL/libjpeg-turbo/
ffmpeg calls under the SAME contract (payload bytes → (w, h, RGB
pixels) / PCM dict), leaving every Spark-side piece — MEDIA_SCHEMA /
FEATURE_SCHEMA, the Arrow ``mapInPandas`` batching in
``extract_features``, partitioning, and the gate's quantized-feature
comparison — unchanged.
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


def _grid_pool(w: int, h: int, px: list[tuple[int, int, int]],
               grid: int = 4) -> list[float]:
    """Grid-pooled mean RGB (the resize-to-grid step as average pooling):
    grid×grid×3 floats in [0,1]."""
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


def bmp_feature(payload: bytes, grid: int = 4) -> list[float]:
    w, h, px = decode_bmp(payload)
    return _grid_pool(w, h, px, grid)


# ---------------------------------------------------------------------------
# PNG: real stdlib codec (zlib inflate + struct chunk walk + per-row
# unfiltering) — non-interlaced, 8-bit depth, color types 0/2/3/4/6
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(seed: int, width: int = 16, height: int = 16,
             interlace: bool = False, bit_depth: int = 8) -> bytes:
    """Deterministic truecolor PNG.  Rows cycle filter types None/Sub/Up
    so the decoder's unfiltering paths are really exercised; optional
    Adam7 interlacing (each pass filtered independently) and 16-bit
    depth (low byte is seeded noise the decoder must ignore)."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ss = bit_depth // 8
    bpp = 3 * ss

    def pixel_row(xs, y) -> bytearray:
        row = bytearray()
        for x in xs:
            for v in ((x * 13 + seed * 7) % 256,
                      (y * 29 + seed * 11) % 256,
                      ((x + y) * 31 + seed * 3) % 256):
                row.append(v)
                if ss == 2:
                    row.append((v * 7 + 3) % 256)   # 16-bit low byte
        return row

    def filter_rows(rows) -> bytearray:
        out = bytearray()
        prior = bytes(len(rows[0])) if rows else b""
        for i, row in enumerate(rows):
            ft = i % 3
            out.append(ft)
            if ft == 0:                   # None
                out += row
            elif ft == 1:                 # Sub
                out += bytes((row[j] - (row[j - bpp] if j >= bpp else 0))
                             & 255 for j in range(len(row)))
            else:                         # Up
                out += bytes((row[j] - prior[j]) & 255
                             for j in range(len(row)))
            prior = bytes(row)
        return out

    raw = bytearray()
    if not interlace:
        raw += filter_rows([pixel_row(range(width), y)
                            for y in range(height)])
    else:
        for x0, y0, dx, dy in _ADAM7:
            xs = list(range(x0, width, dx))
            ys = list(range(y0, height, dy))
            if xs and ys:
                raw += filter_rows([pixel_row(xs, y) for y in ys])
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _unfilter_rows(raw: bytes, off: int, n_rows: int, stride: int,
                   bpp: int) -> tuple[list[bytearray], int]:
    """Unfilter n_rows scanlines (None/Sub/Up/Average/Paeth) starting at
    ``off``; returns (rows, new offset).  ``bpp`` = bytes per complete
    pixel (the filter distance)."""
    prior = bytearray(stride)
    rows: list[bytearray] = []
    for _y in range(n_rows):
        ft = raw[off]
        row = bytearray(raw[off + 1:off + 1 + stride])
        off += 1 + stride
        if ft == 1:                              # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 255
        elif ft == 2:                            # Up
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 255
        elif ft == 3:                            # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prior[i]) >> 1)) & 255
        elif ft == 4:                            # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                row[i] = (row[i] + pred) & 255
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        prior = row
        rows.append(row)
    return rows, off


def decode_png(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """PNG → (width, height, row-major RGB pixels).  Pure stdlib: struct
    chunk walk + zlib inflate + per-row unfilter (None/Sub/Up/Average/
    Paeth).  Supports every legal bit depth — 1/2/4-bit gray/palette
    (MSB-first packed, gray scaled to 8-bit), 8- and 16-bit
    gray/truecolor/palette with or without alpha (alpha is dropped,
    16-bit samples take the high byte) — both non-interlaced and
    Adam7-interlaced."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bitd = colt = interlace = None
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bitd, colt, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitd not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {bitd}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colt)
    if channels is None:
        raise ValueError(f"bad PNG color type {colt}")
    if bitd < 8 and colt not in (0, 3):
        raise ValueError(
            f"sub-byte depth {bitd} is only valid for gray/palette")
    ss = max(1, bitd // 8)                       # bytes per sample (≥8bit)
    # filter distance: whole bytes per pixel, min 1 (PNG §9.2)
    bpp = max(1, channels * bitd // 8)
    raw = zlib.decompress(bytes(idat))
    gray_max = (1 << bitd) - 1

    def row_px(row: bytearray, x: int) -> tuple[int, int, int]:
        if colt == 2:                            # truecolor
            b = x * 3 * ss
            return (row[b], row[b + ss], row[b + 2 * ss])
        if colt == 6:                            # truecolor + alpha
            b = x * 4 * ss
            return (row[b], row[b + ss], row[b + 2 * ss])
        if bitd < 8:
            # MSB-first packed samples (gray scaled to 8-bit, or
            # palette index)
            per_byte = 8 // bitd
            shift = 8 - bitd * (x % per_byte + 1)
            v = (row[x // per_byte] >> shift) & gray_max
            if colt == 0:
                v = v * 255 // gray_max
                return (v, v, v)
            j = v * 3
            return (plte[j], plte[j + 1], plte[j + 2])
        if colt == 0:                            # grayscale
            v = row[x * ss]
            return (v, v, v)
        if colt == 4:                            # gray + alpha
            v = row[x * 2 * ss]
            return (v, v, v)
        j = row[x] * 3                           # palette, 8-bit index
        return (plte[j], plte[j + 1], plte[j + 2])

    def stride_of(npx: int) -> int:
        return (npx * channels * bitd + 7) // 8

    if interlace == 0:
        rows, _ = _unfilter_rows(raw, 0, height, stride_of(width), bpp)
        return width, height, [row_px(row, x)
                               for row in rows for x in range(width)]
    if interlace != 1:
        raise ValueError(f"bad PNG interlace method {interlace}")
    # Adam7: seven independently-filtered sub-images, pixels scattered
    # back onto the full grid
    pixels: list = [(0, 0, 0)] * (width * height)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rows, off = _unfilter_rows(raw, off, ph, stride_of(pw), bpp)
        for yi, row in enumerate(rows):
            y = y0 + yi * dy
            for xi in range(pw):
                pixels[y * width + x0 + xi * dx] = row_px(row, xi)
    return width, height, pixels


def png_feature(payload: bytes, grid: int = 4) -> list[float]:
    w, h, px = decode_png(payload)
    return _grid_pool(w, h, px, grid)


def make_jpeg(seed: int, width: int = 16, height: int = 16,
              progressive: bool = False, subsample: bool = False) -> bytes:
    """Deterministic JPEG — baseline SOF0 (4:4:4 or 4:2:0) or
    progressive SOF2 (same seeded pixel formula as BMP/PNG; lossy, so
    features are asserted within tolerance, not equality)."""
    from .jpeg import encode_jpeg, encode_jpeg_420, encode_jpeg_progressive
    pix = [((x * 13 + seed * 7) % 256,
            (y * 29 + seed * 11) % 256,
            ((x + y) * 31 + seed * 3) % 256)
           for y in range(height) for x in range(width)]
    enc = (encode_jpeg_progressive if progressive
           else encode_jpeg_420 if subsample else encode_jpeg)
    return enc(width, height, pix)


def jpeg_feature(payload: bytes, grid: int = 4) -> list[float]:
    from .jpeg import decode_jpeg
    w, h, px = decode_jpeg(payload)
    return _grid_pool(w, h, px, grid)


# ---------------------------------------------------------------------------
# Video: MJPEG-in-AVI — a REAL container+codec decode in pure stdlib
# (RIFF chunk walk → per-frame baseline JPEG via ops/jpeg.py).  Other
# video codecs (MP4/H.264/...) remain behind the fake_feature stand-in;
# the production swap-in for those is ffmpeg under the same
# payload→frames contract.
# ---------------------------------------------------------------------------

def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""       # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def make_avi_mjpeg(seed: int, width: int = 16, height: int = 16,
                   n_frames: int = 4, fps: int = 4) -> bytes:
    """Deterministic MJPEG AVI: RIFF('AVI ') with avih/strh/strf headers,
    a movi list of per-frame baseline JPEGs (frame f uses the seeded
    pixel formula shifted by f) and an idx1 index."""
    from .jpeg import encode_jpeg
    us_per_frame = 1_000_000 // fps
    frames = []
    for f in range(n_frames):
        s = seed + 1000 * f
        pix = [((x * 13 + s * 7) % 256,
                (y * 29 + s * 11) % 256,
                ((x + y) * 31 + s * 3) % 256)
               for y in range(height) for x in range(width)]
        frames.append(encode_jpeg(width, height, pix))
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10, n_frames, 0, 1,
                       max(len(f) for f in frames), width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1, fps, 0,
                                            n_frames, 0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi_body = b"".join(_riff_chunk(b"00dc", f) for f in frames)
    movi = _riff_list(b"movi", movi_body)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> dict:
    """MJPEG AVI → {width, height, n_frames, us_per_frame, frames} with
    frames decoded to (w, h, RGB pixels) by the stdlib JPEG decoder.
    Walks the RIFF structure (hdrl for geometry/timing, movi for '00dc'/
    '00db' frame chunks, nested 'rec ' lists tolerated)."""
    from .jpeg import decode_jpeg
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    meta = {"width": None, "height": None, "n_frames": None,
            "us_per_frame": None}
    frames: list = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            ln = struct.unpack_from("<I", buf, pos + 4)[0]
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_start + ln)
            elif fourcc == b"avih":
                (meta["us_per_frame"], _, _, _, meta["n_frames"], _, _, _,
                 meta["width"], meta["height"]) = \
                    struct.unpack_from("<10I", buf, data_start)
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(decode_jpeg(buf[data_start:data_start + ln]))
            pos = data_start + ln + (ln % 2)      # word alignment

    walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if not frames:
        raise ValueError("AVI contains no video frames")
    meta["frames"] = frames
    if meta["n_frames"] is None:
        meta["n_frames"] = len(frames)
    if meta["us_per_frame"] is None or meta["us_per_frame"] <= 0:
        # avih header absent/zeroed: assume 25 fps so timestamp-based
        # sampling still works instead of crashing on None arithmetic
        meta["us_per_frame"] = 1_000_000 // 25
    return meta


def video_feature(payload: bytes, grid: int = 4) -> list[float]:
    """Temporal mean of per-frame grid-pooled RGB features over the real
    MJPEG decode — frame sampling + feature extraction in one pass."""
    d = decode_avi_mjpeg(payload)
    per_frame = [_grid_pool(w, h, px, grid) for w, h, px in d["frames"]]
    n = len(per_frame)
    return [sum(f[i] for f in per_frame) / n
            for i in range(len(per_frame[0]))]


def decode_image(payload: bytes) -> "object":
    """Image decode dispatch on magic bytes: BMP, PNG (every legal bit
    depth, incl. Adam7) and baseline (4:4:4/4:2:0) or progressive JPEG
    all decode natively (pure stdlib — see ops/jpeg.py for the
    remaining boundaries).  MJPEG-in-AVI video decodes natively too
    (decode_avi_mjpeg); other video codecs (MP4/...) remain stubbed:
    fake_feature."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    raise NotImplementedError(
        "unrecognized image format — BMP/PNG/baseline-JPEG decode "
        "natively; other codecs need external libraries not in this "
        "environment (use fake_feature)")


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
            # rotate through the real stdlib image codecs
            sel = (i // 3) % 5
            if sel == 0:
                payload, mime = make_bmp(i), "image/bmp"
            elif sel == 1:
                payload, mime = make_png(i), "image/png"
            elif sel == 2:
                payload, mime = make_jpeg(i), "image/jpeg"
            elif sel == 3:
                payload, mime = make_jpeg(i, progressive=True), "image/jpeg"
            else:
                payload, mime = make_jpeg(i, subsample=True), "image/jpeg"
            rows.append((i, kind, mime, 16, 16, None,
                         bytearray(payload)))
        elif kind == "audio":
            payload = make_wav(i)
            rows.append((i, kind, "audio/wav", None, None, 50,
                         bytearray(payload)))
        elif (i // 3) % 2 == 0:
            # REAL video: MJPEG-in-AVI (4 frames @ 4 fps, stdlib decode)
            payload = make_avi_mjpeg(i)
            rows.append((i, kind, "video/avi", 16, 16, 1000,
                         bytearray(payload)))
        else:
            # other codecs (MP4/...): documented fake_feature stand-in
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
                elif mime == "image/png":
                    feats.append(png_feature(b))
                elif mime == "image/jpeg":
                    feats.append(jpeg_feature(b))
                elif mime == "video/avi":
                    feats.append(video_feature(b))
                else:
                    feats.append(fake_feature(b))
            yield pd.DataFrame({"media_id": ids, "feature": feats,
                                "n_bytes": sizes})

    return media.select("media_id", "mime", "payload") \
                .mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Correctness gate (VERDICT r3 item 3): deterministic media → quantized
# features vs a DuckDB VALUES lookup oracle.  For the lossless formats
# (WAV/BMP/PNG) the expected features are computed ANALYTICALLY from the
# seeded sample/pixel formulas — an independent path that never touches
# the decoders, so the gate proves encode→decode→pool end-to-end.  JPEG
# is lossy: its expectations are value-locked to the codec (coarser
# quantization), and video rows lock the documented fake_feature stand-in
# (recomputed here straight from hashlib).
# ---------------------------------------------------------------------------

_QUANT_EPS = 0.5001   # epsilon past .5 so float32 storage can't straddle
                      # a rounding boundary; both sides use the identical
                      # formula over the float32-rounded feature values


def _f32(v: float) -> float:
    """The float32 value actually stored in the feature column (Arrow
    casts the Python float64 to float32 round-to-nearest)."""
    return float(struct.unpack("<f", struct.pack("<f", v))[0])


def _quantize(vals: list[float], q: int) -> str:
    return ",".join(str(math.floor(_f32(v) * q + _QUANT_EPS)) for v in vals)


def _analytic_image_feature(seed: int, w: int = 16, h: int = 16,
                            grid: int = 4) -> list[float]:
    """Grid-pooled mean RGB straight from the seeded pixel formula — no
    decoding involved (mirrors _grid_pool's exact expression order)."""
    feats = []
    for gy in range(grid):
        for gx in range(grid):
            n = rs = gs = bs = 0
            for y in range(gy * h // grid, (gy + 1) * h // grid):
                for x in range(gx * w // grid, (gx + 1) * w // grid):
                    rs += (x * 13 + seed * 7) % 256
                    gs += (y * 29 + seed * 11) % 256
                    bs += ((x + y) * 31 + seed * 3) % 256
                    n += 1
            feats += [rs / n / 255.0, gs / n / 255.0, bs / n / 255.0]
    return feats


def _analytic_wav_feature(seed: int, sample_rate: int = 8000,
                          n_samples: int = 400,
                          n_windows: int = 8) -> list[float]:
    """RMS/zero-crossing features straight from the seeded sine formula."""
    freq = 200 + (seed * 37) % 800
    amp = 8000 + (seed * 53) % 16000
    s = [int(amp * math.sin(2 * math.pi * freq * i / sample_rate))
         for i in range(n_samples)]
    win = max(1, len(s) // n_windows)
    feats = []
    for wi in range(n_windows):
        chunk = s[wi * win:(wi + 1) * win] or [0]
        rms = math.sqrt(sum(x * x for x in chunk) / len(chunk))
        feats.append(rms / 32768.0)
    zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
    feats.append(zc / max(1, len(s) - 1))
    return feats


def _expected_feature_rows(n: int = 48) -> list[tuple]:
    """(media_id, mime, n_bytes, feat_q) expected rows for
    synthetic_media_df(spark, n)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            sel = (i // 3) % 5
            if sel == 0:
                payload, mime = make_bmp(i), "image/bmp"
                feat, q = _analytic_image_feature(i), 1000
            elif sel == 1:
                payload, mime = make_png(i), "image/png"
                feat, q = _analytic_image_feature(i), 1000
            else:
                payload = make_jpeg(i, progressive=(sel == 3),
                                    subsample=(sel == 4))
                mime = "image/jpeg"
                # lossy: value-locked to the codec, coarse quantization
                feat, q = jpeg_feature(payload), 100
        elif kind == "audio":
            payload, mime = make_wav(i), "audio/wav"
            feat, q = _analytic_wav_feature(i), 1000
        elif (i // 3) % 2 == 0:
            payload, mime = make_avi_mjpeg(i), "video/avi"
            # lossy per-frame JPEG: value-locked like the JPEG image rows
            feat, q = video_feature(payload), 100
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
            mime = "video/x-fake"
            feat = [int(hashlib.md5(payload + d.to_bytes(2, "big"))
                        .hexdigest()[:8], 16) / 2 ** 32 for d in range(16)]
            q = 1000
        rows.append((i, mime, len(payload), _quantize(feat, q)))
    return rows


def multimodal_features_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: extract_features over the deterministic media table,
    features quantized per format (1000 steps; 100 for lossy JPEG)."""
    media = synthetic_media_df(spark, 48)
    feats = extract_features(media)

    def quant_expr(q: float):
        return F.array_join(
            F.transform(F.col("feature"),
                        lambda x: F.floor(x.cast("double") * F.lit(q)
                                          + F.lit(_QUANT_EPS))
                         .cast("long").cast("string")), ",")

    lossy = F.col("mime").isin("image/jpeg", "video/avi")
    return (feats.join(F.broadcast(media.select("media_id", "mime")),
                       "media_id")
            .select(F.col("media_id"), F.col("mime"), F.col("n_bytes"),
                    F.when(lossy, quant_expr(100.0))
                     .otherwise(quant_expr(1000.0)).alias("feat_q"))
            .orderBy("media_id"))


def multimodal_features_oracle_sql() -> str:
    rows = ",\n".join(
        f"({mid}, '{mime}', {nb}, '{fq}')"
        for mid, mime, nb, fq in _expected_feature_rows(48))
    return ("SELECT media_id, mime, n_bytes, feat_q FROM (VALUES\n"
            f"{rows}\n) t(media_id, mime, n_bytes, feat_q) "
            "ORDER BY media_id")


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (native explode over the duration).  For MJPEG-in-AVI payloads the
    frames themselves decode natively (decode_avi_mjpeg /
    sample_video_frames); for other codecs only the sampling plan is
    real."""
    frames = F.explode(F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms)))
    return (media.where(F.col("kind") == "video")
                 .select("media_id", frames.alias("frame_ts_ms")))


FRAME_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_ts_ms", IntegerType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])


def sample_video_frames(media: DataFrame, every_ms: int = 500,
                        grid: int = 4) -> DataFrame:
    """Frame sampling WITH real decode: one row per sampled timestamp,
    carrying the grid-pooled feature of the frame at that instant for
    MJPEG-in-AVI payloads (each payload decoded ONCE per batch, frames
    indexed by ts // us_per_frame).  Codecs without a native decoder
    emit NULL features — the sampling plan stays real, the decode is
    the documented swap-in point (ffmpeg)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, tss, feats = [], [], []
            for mid, mime, dur, payload in zip(
                    pdf["media_id"], pdf["mime"], pdf["duration_ms"],
                    pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dur = int(dur) if dur is not None and dur == dur else 0
                decoded = None
                if mime == "video/avi":
                    d = decode_avi_mjpeg(b)
                    decoded = [_grid_pool(w, h, px, grid)
                               for w, h, px in d["frames"]]
                    ms_per_frame = max(1, d["us_per_frame"] // 1000)
                for ts in range(0, max(dur, 1), every_ms):
                    ids.append(int(mid))
                    tss.append(ts)
                    if decoded is None:
                        feats.append(None)
                    else:
                        idx = min(ts // ms_per_frame, len(decoded) - 1)
                        feats.append(decoded[idx])
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss,
                                "feature": feats})

    return (media.where(F.col("kind") == "video")
                 .select("media_id", "mime", "duration_ms", "payload")
                 .mapInPandas(run, FRAME_FEATURE_SCHEMA))
