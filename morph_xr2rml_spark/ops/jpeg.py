"""Baseline JPEG codec in pure stdlib Python (ITU-T T.81).

Scope: baseline sequential DCT (SOF0) AND progressive (SOF2 —
spectral selection + successive approximation, DC/AC first and
refinement scans, EOBn runs, per-scan huffman tables), 8-bit, 1 or 3
components, 4:4:4 and 4:2:0 chroma subsampling (sequential; sampling
factors 1 and 2).  Arithmetic coding, progressive+subsampled combined,
hierarchical modes and 12-bit raise ``NotImplementedError``; restart
intervals (DRI/RSTn) decode in sequential mode — this is the correctness-scoped decode
tier for the multimodal plumbing (same pattern as the WAV/BMP/PNG
codecs), not a production JPEG library.

Progressive re-codes the same quantized coefficients as baseline, so
``decode(encode_jpeg_progressive(img)) == decode(encode_jpeg(img))``
EXACTLY — the test oracle.

The encoder exists to build deterministic test fixtures; it writes
quality-50 Annex-K quantization (tables verbatim), so encode→decode is
lossy but deterministic, and decoded pixels are asserted within a
tolerance of the source block means.
"""

from __future__ import annotations

import math
import struct

# Annex K.1 quantization tables (quality 50 reference)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zigzag order: index i of the zigzag sequence → natural position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 standard huffman tables: (bits[1..16], huffval)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * _COS[u][x] * _COS[v][y]
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            out[v * 8 + u] = 0.25 * cu * cv * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[v * 8 + u] * _COS[u][x] * _COS[v][y]
            out[y * 8 + x] = 0.25 * s
    return out


def _build_huff_codes(bits, huffval):
    """(bits, huffval) → {symbol: (code, length)} (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huff_decoder(bits, huffval):
    """(bits, huffval) → {(length, code): symbol}."""
    dec = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            dec[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return dec


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def pad_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s

    def emit_marker(self, marker: int) -> None:
        """Byte-align and append a marker (markers are never stuffed)."""
        self.pad_byte()
        self.buf += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_byte()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1          # stuffed byte
            # (RSTn markers are consumed by sync_restart, never here)
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align (discard pad bits) and consume the expected RSTn
        marker (T.81 F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF \
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category t, t-bit code)."""
    if v == 0:
        return 0, 0
    t = v.bit_length() if v > 0 else (-v).bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return y, cb, cr


def _ycbcr_to_rgb(y: float, cb: float, cr: float) -> tuple[int, int, int]:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else int(round(v)))
    return clamp(r), clamp(g), clamp(b)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _quant_blocks(width: int, height: int,
                  pixels: list[tuple[int, int, int]]):
    """Pixels → per-component zigzag-ordered quantized DCT blocks in
    raster block order: [comp][block][64]."""
    qts = [QT_LUMA, QT_CHROMA]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    blocks: list[list[list[int]]] = [[], [], []]
    for by in range(bh):
        for bx in range(bw):
            planes: list[list[float]] = [[], [], []]
            for y in range(8):
                for x in range(8):
                    px = min(bx * 8 + x, width - 1)
                    py = min(by * 8 + y, height - 1)
                    yv, cbv, crv = _rgb_to_ycbcr(*pixels[py * width + px])
                    planes[0].append(yv - 128)
                    planes[1].append(cbv - 128)
                    planes[2].append(crv - 128)
            for ci in range(3):
                qt = qts[0 if ci == 0 else 1]
                coef = _fdct(planes[ci])
                blocks[ci].append(
                    [int(round(coef[ZIGZAG[i]] / qt[ZIGZAG[i]]))
                     for i in range(64)])
    return bw, bh, blocks


def _headers(width: int, height: int, sof_marker: int) -> bytearray:
    out = bytearray(b"\xFF\xD8")                                  # SOI
    out += _seg(0xFFDB, bytes([0]) + bytes(QT_LUMA[ZIGZAG[i]]      # DQT 0
                                           for i in range(64)))
    out += _seg(0xFFDB, bytes([1]) + bytes(QT_CHROMA[ZIGZAG[i]]    # DQT 1
                                           for i in range(64)))
    out += _seg(sof_marker, struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, (bits, vals) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                   (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))
    return out


_DC_CODES = None
_AC_CODES = None


def _codes():
    global _DC_CODES, _AC_CODES
    if _DC_CODES is None:
        _DC_CODES = [_build_huff_codes(*DC_LUMA),
                     _build_huff_codes(*DC_CHROMA)]
        _AC_CODES = [_build_huff_codes(*AC_LUMA),
                     _build_huff_codes(*AC_CHROMA)]
    return _DC_CODES, _AC_CODES


def _encode_block(w: _BitWriter, tsel: int, quant: list[int],
                  pred: int) -> int:
    """Huffman-encode one zigzag-quantized block (baseline DC diff + AC
    run/size); returns the new DC predictor."""
    dc_codes, ac_codes = _codes()
    diff = quant[0] - pred
    t, code = _magnitude(diff)
    hc, hl = dc_codes[tsel][t]
    w.write(hc, hl)
    if t:
        w.write(code, t)
    run = 0
    for i in range(1, 64):
        v = quant[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[tsel][0xF0]     # ZRL
            w.write(hc, hl)
            run -= 16
        t, code = _magnitude(v)
        hc, hl = ac_codes[tsel][(run << 4) | t]
        w.write(hc, hl)
        w.write(code, t)
        run = 0
    if run:
        hc, hl = ac_codes[tsel][0x00]          # EOB
        w.write(hc, hl)
    return quant[0]


def _quantize_block(vals: list[float], qt: list[int]) -> list[int]:
    coef = _fdct(vals)
    return [int(round(coef[ZIGZAG[i]] / qt[ZIGZAG[i]])) for i in range(64)]


def encode_jpeg(width: int, height: int,
                pixels: list[tuple[int, int, int]],
                restart_interval: int = 0) -> bytes:
    """Baseline 4:4:4 JPEG encoder (deterministic test fixtures);
    restart_interval > 0 emits DRI + RSTn every N MCUs (DC predictors
    reset — re-codes the same coefficients, so decoding is unchanged)."""
    out = _headers(width, height, 0xFFC0)                         # SOF0
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    bw, bh, blocks = _quant_blocks(width, height, pixels)
    w = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    for b in range(bw * bh):
        if restart_interval and b and b % restart_interval == 0:
            w.emit_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = [0, 0, 0]
        for ci in range(3):
            pred[ci] = _encode_block(w, 0 if ci == 0 else 1,
                                     blocks[ci][b], pred[ci])
    out += w.flush()
    out += b"\xFF\xD9"                                            # EOI
    return bytes(out)


def encode_jpeg_420(width: int, height: int,
                    pixels: list[tuple[int, int, int]]) -> bytes:
    """Baseline 4:2:0 JPEG encoder: luma at full resolution (2×2 blocks
    per 16×16 MCU), chroma 2×2-mean-downsampled (one block per MCU).
    For an input whose chroma is constant (e.g. grayscale), downsampling
    loses nothing, so decode(420) == decode(444) EXACTLY — the test
    oracle; color images assert within tolerance."""
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xFFDB, bytes([0]) + bytes(QT_LUMA[ZIGZAG[i]]
                                           for i in range(64)))
    out += _seg(0xFFDB, bytes([1]) + bytes(QT_CHROMA[ZIGZAG[i]]
                                           for i in range(64)))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, (bits, vals) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                   (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)):
        out += _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    def px(x: int, y: int):
        return pixels[min(y, height - 1) * width + min(x, width - 1)]

    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    w = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):                       # 4 luma blocks
                for bx in range(2):
                    blk = []
                    for y in range(8):
                        for x in range(8):
                            yv, _, _ = _rgb_to_ycbcr(
                                *px(mx * 16 + bx * 8 + x,
                                    my * 16 + by * 8 + y))
                            blk.append(yv - 128)
                    pred[0] = _encode_block(
                        w, 0, _quantize_block(blk, QT_LUMA), pred[0])
            for ci in (1, 2):                         # Cb then Cr
                blk = []
                for y in range(8):
                    for x in range(8):
                        acc = 0.0
                        for dy in range(2):
                            for dx in range(2):
                                _, cb, cr = _rgb_to_ycbcr(
                                    *px(mx * 16 + 2 * x + dx,
                                        my * 16 + 2 * y + dy))
                                acc += cb if ci == 1 else cr
                        blk.append(acc / 4 - 128)
                pred[ci] = _encode_block(
                    w, 1, _quantize_block(blk, QT_CHROMA), pred[ci])
    out += w.flush()
    out += b"\xFF\xD9"                                            # EOI
    return bytes(out)


class _SymRecorder(dict):
    """Pass-1 stand-in for a huffman code table: records which symbols a
    scan emits (the Annex-K AC tables lack the EOBn symbols progressive
    scans need, so each AC scan ships its own canonical table)."""

    def __init__(self):
        super().__init__()
        self.seen: set[int] = set()

    def __getitem__(self, k):
        self.seen.add(k)
        return (0, 1)


def _canonical_table(symbols: set[int]):
    """Symbols → (bits[16], huffval, {sym: (code, len)}): all codes the
    same length L with n ≤ 2^L - 1, so the all-ones code never occurs."""
    syms = sorted(symbols) or [0x00]
    n = len(syms)
    L = 1
    while (1 << L) - 1 < n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, codes


class _ProgressiveAcEncoder:
    """AC-scan entropy state shared across blocks: EOBRUN accumulation
    plus the refinement scans' buffered correction bits (T.81 G.1.2.2-3,
    the classic libjpeg-style structure)."""

    def __init__(self, w: _BitWriter, ac_codes: dict):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def sym(self, s: int) -> None:
        hc, hl = self.ac[s]
        self.w.write(hc, hl)

    def flush_pending(self) -> None:
        for b in self.pending_bits:
            self.w.write(b, 1)
        self.pending_bits = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.w.write(self.eobrun, nbits)
            self.eobrun = 0
        self.flush_pending()

    # -- first scan (Ah = 0) -------------------------------------------
    def block_first(self, quant: list[int], ss: int, se: int,
                    al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = quant[k]
            mag = (v if v >= 0 else -v) >> al
            if mag == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                self.sym(0xF0)
                r -= 16
            nbits = mag.bit_length()
            code = mag if v >= 0 else (-mag + (1 << nbits) - 1)
            self.sym((r << 4) | nbits)
            self.w.write(code, nbits)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    # -- refinement scan (Ah = Al + 1) ---------------------------------
    def block_refine(self, quant: list[int], ss: int, se: int,
                     al: int) -> None:
        absv = [0] * (se + 1)
        eob = ss - 1
        for k in range(ss, se + 1):
            t = quant[k]
            t = (t if t >= 0 else -t) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.flush_eobrun()
                self.sym(0xF0)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if t > 1:
                # history-nonzero coefficient: append its correction bit
                br.append(t & 1)
                continue
            # newly significant at this precision
            self.flush_eobrun()
            self.sym((r << 4) | 1)
            self.w.write(1 if quant[k] >= 0 else 0, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending_bits.extend(br)
            if self.eobrun == 0x7FFF or len(self.pending_bits) > 900:
                self.flush_eobrun()


def encode_jpeg_progressive(width: int, height: int,
                            pixels: list[tuple[int, int, int]]) -> bytes:
    """Progressive (SOF2) 4:4:4 JPEG encoder: spectral selection AND
    successive approximation — DC first (Al=1) + DC refinement, then
    per-component AC first scans (1..63, Al=1) + AC refinement scans.
    Progressive re-codes the same quantized coefficients, so decoding
    this stream yields pixels IDENTICAL to the baseline encoding of the
    same image (the test oracle)."""
    dc_codes, ac_codes = _codes()
    out = _headers(width, height, 0xFFC2)                         # SOF2
    bw, bh, blocks = _quant_blocks(width, height, pixels)
    nblocks = bw * bh

    def sos(comps: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for cid, tabs in comps:
            body += bytes([cid, tabs])
        return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, all components interleaved, Al=1
    out += sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    w = _BitWriter()
    pred = [0, 0, 0]
    for b in range(nblocks):
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            v = blocks[ci][b][0] >> 1          # arithmetic shift (T.81 DC)
            diff = v - pred[ci]
            pred[ci] = v
            t, code = _magnitude(diff)
            hc, hl = dc_codes[tsel][t]
            w.write(hc, hl)
            if t:
                w.write(code, t)
    out += w.flush()

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block/component
    out += sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
    w = _BitWriter()
    for b in range(nblocks):
        for ci in range(3):
            w.write(blocks[ci][b][0] & 1, 1)
    out += w.flush()

    # scans 3-5 (AC first, spectral 1..63, Al=1) then 6-8 (AC refinement,
    # Ah=1 Al=0), one component per scan as the spec requires.  Each scan
    # ships its own canonical huffman table (two-pass: record the symbols
    # — EOBn codes included — then encode), redefining DHT slot th before
    # its SOS.
    for refine in (False, True):
        for ci, cid in ((0, 1), (1, 2), (2, 3)):
            th = 0 if ci == 0 else 1

            def run(enc):
                for b in range(nblocks):
                    if refine:
                        enc.block_refine(blocks[ci][b], 1, 63, 0)
                    else:
                        enc.block_first(blocks[ci][b], 1, 63, 1)
                enc.flush_eobrun()

            rec = _SymRecorder()
            run(_ProgressiveAcEncoder(_BitWriter(), rec))
            tbits, tvals, codes = _canonical_table(rec.seen)
            out += _seg(0xFFC4, bytes([0x10 | th]) + bytes(tbits)
                        + bytes(tvals))
            out += sos([(cid, 0x00 if ci == 0 else 0x11)], 1, 63,
                       1 if refine else 0, 0 if refine else 1)
            w = _BitWriter()
            enc = _ProgressiveAcEncoder(w, codes)
            run(enc)
            out += w.flush()

    out += b"\xFF\xD9"                                            # EOI
    return bytes(out)


def _entropy_end(payload: bytes, start: int) -> int:
    """First non-stuffed, non-RST marker after ``start`` — the end of a
    scan's entropy-coded segment."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF and payload[i + 1] != 0x00 \
                and not (0xD0 <= payload[i + 1] <= 0xD7):
            return i
        i += 1
    return n


class _ScanReader(_BitReader):
    def read_symbol(self, dec: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in dec:
                return dec[(length, code)]
        raise ValueError("bad huffman code")


def decode_jpeg(payload: bytes) \
        -> tuple[int, int, list[tuple[int, int, int]]]:
    """JPEG → (width, height, row-major RGB pixels).  Baseline (SOF0)
    and progressive (SOF2: spectral selection + successive approximation
    DC/AC first and refinement scans, EOBn runs) both decode; 4:4:4
    and sequential 4:2:0 sampling, 8-bit, huffman coding.  Restart
    intervals (DRI/RSTn) decode in sequential mode and remain
    unsupported only in progressive mode.  Arithmetic coding,
    progressive+subsampled combined and hierarchical modes remain out
    of scope."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    width = height = None
    progressive = False
    restart_interval = 0
    comps: list[tuple[int, int, int]] = []     # (id, sampling, qt)
    # scans: (comp list [(comp index, dc table, ac table)], ss, se,
    #         ah, al, data bytes)
    scans: list[tuple] = []
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec_id = body[i]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit DQT unsupported")
                zz = body[i + 1:i + 65]
                qt = [0] * 64
                for j in range(64):
                    qt[ZIGZAG[j]] = zz[j]
                qts[prec_id & 0xF] = qt
                i += 65
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            _prec, height, width, n = struct.unpack_from(">BHHB", body)
            for c in range(n):
                cid, samp, qt = body[6 + c * 3:9 + c * 3]
                h_i, v_i = samp >> 4, samp & 0xF
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {h_i}x{v_i} unsupported "
                        "(1 and 2 only)")
                comps.append((cid, (h_i, v_i), qt))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline SOF0 / progressive SOF2 supported "
                f"(got SOF marker 0x{marker:02X})")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17:i + 17 + nvals])
                dec = _build_huff_decoder(bits, vals)
                if tc_th >> 4 == 0:
                    dc_dec[tc_th & 0xF] = dec
                else:
                    ac_dec[tc_th & 0xF] = dec
                i += 17 + nvals
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body)[0]
        elif marker == 0xDA:
            ns = body[0]
            scomps = []
            for c in range(ns):
                cid = body[1 + c * 2]
                tabs = body[2 + c * 2]
                ci = next(i for i, cm in enumerate(comps) if cm[0] == cid)
                scomps.append((ci, tabs >> 4, tabs & 0xF))
            ss, se, ahal = body[1 + ns * 2:4 + ns * 2]
            end = _entropy_end(payload, pos)
            # bind the CURRENT table definitions: later scans may
            # redefine a DHT slot (progressive streams commonly do)
            scans.append((scomps, ss, se, ahal >> 4, ahal & 0xF,
                          payload[pos:end], dict(dc_dec), dict(ac_dec)))
            pos = end
    if width is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    ncomp = len(comps)
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component block grid (cols, rows)
    grids = [(mcux * c[1][0], mcuy * c[1][1]) for c in comps]
    # zigzag-ordered quantized coefficients, accumulated across scans
    coefs = [[[0] * 64 for _ in range(cw * ch)] for cw, ch in grids]
    subsampled = hmax > 1 or vmax > 1
    if progressive and subsampled:
        raise NotImplementedError(
            "progressive + chroma subsampling unsupported")
    if progressive and restart_interval:
        raise NotImplementedError("progressive + DRI unsupported")
    nblocks = mcux * mcuy          # uniform grid for progressive (1x1)

    for scomps, ss, se, ah, al, data, s_dc, s_ac in scans:
        r = _ScanReader(data)
        if not progressive:
            _decode_sequential_scan(r, scomps, comps, grids, coefs,
                                    mcux, mcuy, s_dc, s_ac,
                                    restart_interval)
        elif ss == 0:
            _decode_dc_scan(r, scomps, coefs, nblocks, s_dc, ah, al)
        else:
            if len(scomps) != 1:
                raise ValueError("progressive AC scan must be "
                                 "single-component")
            _decode_ac_scan(r, scomps[0], coefs, nblocks, s_ac,
                            ss, se, ah, al)

    planes = []
    for ci in range(ncomp):
        cw, ch = grids[ci]
        qt = qts[comps[ci][2]]
        plane = [0.0] * (cw * 8 * ch * 8)
        for b in range(cw * ch):
            quant = coefs[ci][b]
            coef = [0.0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = quant[i] * qt[ZIGZAG[i]]
            blk = _idct(coef)
            by, bx = divmod(b, cw)
            for y in range(8):
                for x in range(8):
                    plane[(by * 8 + y) * cw * 8 + bx * 8 + x] = \
                        blk[y * 8 + x] + 128
        planes.append(plane)

    def sample(ci: int, x: int, y: int) -> float:
        # replicated (nearest) chroma upsampling to full resolution
        h_i, v_i = comps[ci][1]
        stride = grids[ci][0] * 8
        return planes[ci][(y * v_i // vmax) * stride + (x * h_i // hmax)]

    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        for x in range(width):
            if ncomp == 1:
                v = sample(0, x, y)
                v = 0 if v < 0 else (255 if v > 255 else int(round(v)))
                pixels.append((v, v, v))
            else:
                pixels.append(_ycbcr_to_rgb(sample(0, x, y),
                                            sample(1, x, y),
                                            sample(2, x, y)))
    return width, height, pixels


def _decode_sequential_scan(r, scomps, comps, grids, coefs,
                            mcux, mcuy, dc_dec, ac_dec,
                            restart_interval: int = 0):
    """Baseline interleaved DC+AC scan (T.81 F.2), MCU-ordered with each
    component's sampling-factor block sub-grid (h×v blocks per MCU);
    every restart_interval MCUs the stream byte-aligns past an RSTn
    marker and DC predictors reset."""
    pred = [0] * len(scomps)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                r.sync_restart()
                pred = [0] * len(scomps)
            mcu_n += 1
            for si, (ci, dcsel, acsel) in enumerate(scomps):
                h_i, v_i = comps[ci][1]
                cw = grids[ci][0]
                for by in range(v_i):
                    for bx in range(h_i):
                        quant = coefs[ci][(my * v_i + by) * cw
                                          + mx * h_i + bx]
                        t = r.read_symbol(dc_dec[dcsel])
                        pred[si] += _extend(r.read_bits(t), t)
                        quant[0] = pred[si]
                        i = 1
                        while i < 64:
                            rs = r.read_symbol(ac_dec[acsel])
                            rrr, ssss = rs >> 4, rs & 0xF
                            if rs == 0x00:       # EOB
                                break
                            if rs == 0xF0:       # ZRL
                                i += 16
                                continue
                            i += rrr
                            quant[i] = _extend(r.read_bits(ssss), ssss)
                            i += 1


def _decode_dc_scan(r, scomps, coefs, nblocks, dc_dec, ah, al):
    """Progressive DC scan: first (Ah=0, diff coding << Al) or
    refinement (one raw bit per block sets bit Al) — T.81 G.2."""
    if ah == 0:
        pred = [0] * len(scomps)
        for b in range(nblocks):
            for si, (ci, dcsel, _acsel) in enumerate(scomps):
                t = r.read_symbol(dc_dec[dcsel])
                pred[si] += _extend(r.read_bits(t), t)
                coefs[ci][b][0] = pred[si] << al
    else:
        for b in range(nblocks):
            for ci, _dcsel, _acsel in scomps:
                if r.read_bit():
                    coefs[ci][b][0] |= (1 << al)


def _decode_ac_scan(r, scomp, coefs, nblocks, ac_dec, ss, se, ah, al):
    """Progressive AC scan for one component: first scan (Ah=0, values
    << Al, EOBn runs) or refinement (correction bits) — T.81 G.2.2."""
    _ci, _dcsel, acsel = scomp
    ci = scomp[0]
    dec = ac_dec[acsel]
    eobrun = 0
    if ah == 0:
        for b in range(nblocks):
            quant = coefs[ci][b]
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = r.read_symbol(dec)
                rrr, ssss = rs >> 4, rs & 0xF
                if ssss == 0:
                    if rrr == 15:          # ZRL
                        k += 16
                        continue
                    eobrun = (1 << rrr) - 1
                    if rrr:
                        eobrun += r.read_bits(rrr)
                    break
                k += rrr
                quant[k] = _extend(r.read_bits(ssss), ssss) << al
                k += 1
        return
    # refinement (Ah = Al + 1): correction-bit decoding
    p1 = 1 << al
    m1 = -p1

    def correct(quant, k):
        """Read a correction bit for a history-nonzero coefficient."""
        if r.read_bit():
            if quant[k] > 0 and not (quant[k] & p1):
                quant[k] += p1
            elif quant[k] < 0 and not (-quant[k] & p1):
                quant[k] += m1

    for b in range(nblocks):
        quant = coefs[ci][b]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = r.read_symbol(dec)
                rrr, ssss = rs >> 4, rs & 0xF
                newval = 0
                if ssss == 0:
                    if rrr != 15:
                        eobrun = (1 << rrr)
                        if rrr:
                            eobrun += r.read_bits(rrr)
                        break              # EOB run starts at this block
                    # rrr == 15: ZRL — skip 16 zero-history positions
                else:
                    if ssss != 1:
                        raise ValueError(
                            "bad AC refinement magnitude category")
                    newval = p1 if r.read_bit() else m1
                while k <= se:
                    if quant[k] != 0:
                        correct(quant, k)
                    else:
                        if rrr == 0:
                            break
                        rrr -= 1
                    k += 1
                if newval and k <= se:
                    quant[k] = newval
                k += 1
        if eobrun > 0:
            # block is within an EOB run: only corrections to Se
            while k <= se:
                if quant[k] != 0:
                    correct(quant, k)
                k += 1
            eobrun -= 1
