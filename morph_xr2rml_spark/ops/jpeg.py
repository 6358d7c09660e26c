"""Baseline JPEG codec in pure stdlib Python (ITU-T T.81).

Scope: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
4:4:4 (no chroma subsampling), huffman entropy coding with the
standard Annex K tables.  Progressive (SOF2), arithmetic coding,
subsampled chroma, and 12-bit raise ``NotImplementedError`` — this is
the correctness-scoped decode tier for the multimodal plumbing (same
pattern as the WAV/BMP/PNG codecs), not a production JPEG library.

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

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s
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
            # (restart markers unsupported: no DRI emitted/accepted)
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


def encode_jpeg(width: int, height: int,
                pixels: list[tuple[int, int, int]]) -> bytes:
    """Baseline 4:4:4 JPEG encoder (deterministic test fixtures)."""
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                                  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(QT_LUMA[ZIGZAG[i]]       # DQT 0
                                          for i in range(64)))
    out += seg(0xFFDB, bytes([1]) + bytes(QT_CHROMA[ZIGZAG[i]]     # DQT 1
                                          for i in range(64)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)   # SOF0
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, (bits, vals) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                   (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_codes = [_build_huff_codes(*DC_LUMA), _build_huff_codes(*DC_CHROMA)]
    ac_codes = [_build_huff_codes(*AC_LUMA), _build_huff_codes(*AC_CHROMA)]
    qts = [QT_LUMA, QT_CHROMA]
    w = _BitWriter()
    pred = [0, 0, 0]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
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
                tsel = 0 if ci == 0 else 1
                coef = _fdct(planes[ci])
                qt = qts[tsel]
                quant = [int(round(coef[ZIGZAG[i]] / qt[ZIGZAG[i]]))
                         for i in range(64)]
                diff = quant[0] - pred[ci]
                pred[ci] = quant[0]
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
    out += w.flush()
    out += b"\xFF\xD9"                                            # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) \
        -> tuple[int, int, list[tuple[int, int, int]]]:
    """Baseline JPEG → (width, height, row-major RGB pixels)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []     # (id, sampling, qt)
    scan: list[tuple[int, int, int]] = []      # (id, dc table, ac table)
    data_start = None
    while pos < len(payload):
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
        elif marker == 0xC0:
            _prec, height, width, n = struct.unpack_from(">BHHB", body)
            for c in range(n):
                cid, samp, qt = body[6 + c * 3:9 + c * 3]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, samp, qt))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline SOF0 supported (got SOF marker "
                f"0x{marker:02X})")
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
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid = body[1 + c * 2]
                tabs = body[2 + c * 2]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            data_start = pos
            break
    if width is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    r = _BitReader(payload[data_start:])

    def read_symbol(dec: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            if (length, code) in dec:
                return dec[(length, code)]
        raise ValueError("bad huffman code")

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    ncomp = len(comps)
    planes = [[0.0] * (bw * 8 * bh * 8) for _ in range(ncomp)]
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                _cid, dcsel, acsel = scan[ci]
                qt = qts[comps[ci][2]]
                t = read_symbol(dc_dec[dcsel])
                diff = _extend(r.read_bits(t), t)
                pred[ci] += diff
                quant = [0] * 64
                quant[0] = pred[ci]
                i = 1
                while i < 64:
                    rs = read_symbol(ac_dec[acsel])
                    rrr, ssss = rs >> 4, rs & 0xF
                    if rs == 0x00:       # EOB
                        break
                    if rs == 0xF0:       # ZRL
                        i += 16
                        continue
                    i += rrr
                    quant[i] = _extend(r.read_bits(ssss), ssss)
                    i += 1
                coef = [0.0] * 64
                for i in range(64):
                    coef[ZIGZAG[i]] = quant[i] * qt[ZIGZAG[i]]
                blk = _idct(coef)
                for y in range(8):
                    for x in range(8):
                        planes[ci][(by * 8 + y) * bw * 8 + bx * 8 + x] = \
                            blk[y * 8 + x] + 128
    pixels: list[tuple[int, int, int]] = []
    stride = bw * 8
    for y in range(height):
        for x in range(width):
            if ncomp == 1:
                v = planes[0][y * stride + x]
                v = 0 if v < 0 else (255 if v > 255 else int(round(v)))
                pixels.append((v, v, v))
            else:
                pixels.append(_ycbcr_to_rgb(planes[0][y * stride + x],
                                            planes[1][y * stride + x],
                                            planes[2][y * stride + x]))
    return width, height, pixels
