"""Pure-stdlib baseline JPEG codec (numpy DCT + Huffman) — the real
JPEG path for the multimodal operators in a container that ships no
image library.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale (1 component)
and YCbCr 4:4:4 (3 components, no subsampling), standard ITU T.81
Annex K quantization + Huffman tables with IJG quality scaling, no
restart intervals, no progressive/arithmetic modes. That profile is
enough to (a) decode this codec's own output bit-deterministically and
(b) read the dominant crawl-image format's baseline subset — the
VERDICT r4 "what's missing" #5 seam (multimodal.py previously fell
through to PIL-or-fake for JPEG).

Everything here derives from the public JPEG specification (ITU T.81 /
ISO 10918-1): the zigzag order, Annex K.1/K.2 quantization tables,
Annex K.3 Huffman tables, and the JFIF APP0 wrapper.

Exactness note used by q_jpeg_pipeline: a CONSTANT 8x8 block has a
DC-only DCT — if the (level-shifted, x8) DC value is divisible by the
quantizer's Q[0,0], the round trip reproduces the block EXACTLY, so a
fabricated image of uniform tiles with even grayscale values survives
encode -> decode bit-for-bit and an SQL oracle can predict the decoded
pixels arithmetically despite JPEG being lossy in general.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Payload is not a baseline JPEG this codec supports."""


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- tables

# ITU T.81 Annex K.1 / K.2 quantization tables (natural order).
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QT_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zigzag scan order: _ZIG[k] = (row, col) of the k-th coefficient
_ZIG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman specs: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis: S = C @ block @ C.T is the spec FDCT.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public libjpeg rule)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_QT_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_QT_CHR * scale + 50) // 100, 1, 255)
    return lum.astype(np.int64), chr_.astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 procedure."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _build_codes(bits, vals)
    return {(ln, c): sym for sym, (c, ln) in enc.items()}


def _category(v: int) -> int:
    """Magnitude category (number of bits) of a DC diff / AC value."""
    return int(abs(int(v))).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            else:
                raise JpegError("unexpected marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 EXTEND: map the `cat` raw bits back to a signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _encode_blocks(
    writer: _BitWriter,
    coefs: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """Entropy-encode one block's zigzag coefficients; returns new DC."""
    zz = coefs.reshape(64)[_ZIG]
    diff = int(zz[0]) - prev_dc
    cat = _category(diff)
    code, ln = dc_codes[cat]
    writer.write(code, ln)
    if cat:
        writer.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l_ = ac_codes[0xF0]  # ZRL
            writer.write(c, l_)
            run -= 16
        cat = _category(v)
        c, l_ = ac_codes[(run << 4) | cat]
        writer.write(c, l_)
        writer.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        c, l_ = ac_codes[0x00]  # EOB
        writer.write(c, l_)
    return int(zz[0])


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (H//8, W//8, 8, 8) quantized int coefs."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    blocks = shifted.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    # batched FDCT over all blocks at once:
    # S[u,v] = sum_{y,x} C[u,y] * B[y,x] * C[v,x]  (== C @ B @ C.T)
    s = np.einsum("uy,abyx,vx->abuv", _C, blocks, _C)
    return np.round(s / qt.astype(np.float64)).astype(np.int64)


def _dequant_idct(coefs: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(nby, nbx, 8, 8) int coefs -> (8*nby, 8*nbx) uint8 plane."""
    s = coefs.astype(np.float64) * qt.astype(np.float64)
    # batched IDCT: B[y,x] = sum_{u,v} C[u,y] * S[u,v] * C[v,x]
    b = np.einsum("uy,abuv,vx->abyx", _C, s, _C)
    nby, nbx = coefs.shape[:2]
    plane = b.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
    return np.clip(np.round(plane), 0, 255).astype(np.uint8)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt_payload(tid: int, qt: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(qt.reshape(64)[_ZIG[k]]) for k in range(64))


def _dht_payload(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


def encode(img: np.ndarray, quality: int = 50) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JFIF."""
    if img.dtype != np.uint8:
        raise JpegError("uint8 input required")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise JpegError("expected (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    qlum, qchr = _scaled_tables(quality)

    if gray:
        planes = [(_pad_to_8(img), qlum, 0)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(np.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
        cr = np.clip(np.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
        planes = [
            (_pad_to_8(y.astype(np.uint8)), qlum, 0),
            (_pad_to_8(cb.astype(np.uint8)), qchr, 1),
            (_pad_to_8(cr.astype(np.uint8)), qchr, 1),
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, _dqt_payload(0, qlum))
    if not gray:
        out += _seg(0xFFDB, _dqt_payload(1, qchr))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, _dht_payload(0, 0, _DC_LUM))
    out += _seg(0xFFC4, _dht_payload(1, 0, _AC_LUM))
    if not gray:
        out += _seg(0xFFC4, _dht_payload(0, 1, _DC_CHR))
        out += _seg(0xFFC4, _dht_payload(1, 1, _AC_CHR))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    dc_lum = _build_codes(*_DC_LUM)
    ac_lum = _build_codes(*_AC_LUM)
    dc_chr = _build_codes(*_DC_CHR)
    ac_chr = _build_codes(*_AC_CHR)
    coefs = [_fdct_quant(p, qt) for p, qt, _ in planes]
    writer = _BitWriter()
    prev = [0] * ncomp
    nby, nbx = coefs[0].shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                dc_c = dc_lum if ci == 0 else dc_chr
                ac_c = ac_lum if ci == 0 else ac_chr
                prev[ci] = _encode_blocks(
                    writer, coefs[ci][by, bx], dc_c, ac_c, prev[ci]
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG produced by this codec (and the common
    baseline 4:4:4 / grayscale subset generally). Returns (H, W) uint8
    for grayscale, (H, W, 3) uint8 RGB otherwise."""
    if not is_jpeg(payload):
        raise JpegError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc tab, ac tab)
    data_start = -1
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4:
                    raise JpegError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tbl[_ZIG[k]] = body[off + 1 + k]
                qts[pq_tq & 0xF] = tbl.reshape(8, 8)
                off += 65
        elif marker in (0xFFC0, 0xFFC1):
            if body[0] != 8:
                raise JpegError("8-bit precision only")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise JpegError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, samp, tq))
        elif marker in (0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise JpegError("progressive/arithmetic JPEG unsupported")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                tab = _build_decode(bits, vals)
                if tc_th >> 4:
                    ac_tabs[tc_th & 0xF] = tab
                else:
                    dc_tabs[tc_th & 0xF] = tab
                off += 17 + nv
        elif marker == 0xFFDD:
            raise JpegError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            scan = []
            cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
            for si in range(ns):
                cid, tabs = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cid_to_idx[cid], tabs >> 4, tabs & 0xF))
            data_start = pos + 2 + length
            break
        pos += 2 + length
    if data_start < 0 or not comps:
        raise JpegError("no scan found")

    # entropy segment runs to EOI
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        end = n
    reader = _BitReader(payload[data_start:end])
    ncomp = len(comps)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    coefs = [np.zeros((nby, nbx, 8, 8), dtype=np.int64) for _ in range(ncomp)]
    prev = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci, dct, act in scan:
                dtab, atab = dc_tabs[dct], ac_tabs[act]
                cat = reader.read_symbol(dtab)
                diff = _extend(reader.read_bits(cat), cat)
                prev[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = prev[ci]
                k = 1
                while k < 64:
                    sym = reader.read_symbol(atab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    cat = sym & 0xF
                    if k > 63:
                        raise JpegError("AC index out of range")
                    zz[k] = _extend(reader.read_bits(cat), cat)
                    k += 1
                blk = np.zeros(64, dtype=np.int64)
                blk[_ZIG] = zz
                coefs[ci][by, bx] = blk.reshape(8, 8)

    planes = [
        _dequant_idct(coefs[i], qts[comps[i][2]])[:h, :w] for i in range(ncomp)
    ]
    if ncomp == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = np.clip(np.round(y + 1.402 * cr), 0, 255)
    g = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.round(y + 1.772 * cb), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def dims(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF header without a full
    decode — the metadata path used by multimodal meta extraction."""
    if not is_jpeg(payload):
        raise JpegError("not a JPEG")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker in (0xFFC0, 0xFFC1, 0xFFC2, 0xFFC3):
            body = payload[pos + 4 : pos + 9]
            h, w = struct.unpack(">HH", body[1:5])
            return int(w), int(h), int(payload[pos + 9])
        if marker == 0xFFD9 or marker == 0xFFDA:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        pos += 2 + length
    raise JpegError("no SOF header")
