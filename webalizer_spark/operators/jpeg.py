"""Pure-Python baseline JPEG codec (grayscale + YCbCr color, SOF0) —
numpy + stdlib.

Closes the external-library gap in operators/multimodal.py for images:
JFIF baseline sequential DCT, 8-bit, 1-component grayscale or
3-component YCbCr with 4:4:4 / 4:2:0 (and 4:2:2) chroma subsampling.
The ENCODER emits a spec-correct stream (SOI / APP0 / DQT / SOF0 / DHT /
SOS / EOI, Annex-K luminance+chrominance tables scaled by quality,
canonical Huffman codes, MCU-interleaved scan, 0xFF byte stuffing); the
DECODER parses DQT/SOF0/DHT/SOS from the FILE — not from compiled-in
constants — so any other tool's baseline JPEG decodes too, and a
transcription slip in our default tables could not self-cancel.

Round-5 extension: PROGRESSIVE DCT (SOF2) encode + decode — spectral
selection and successive approximation per T.81 Annex G (DC first/refine
scans, per-component AC first/refine scans with EOB-run codes and
correction bits). Successive approximation is exact: once every scan has
landed the decoder holds the same quantized coefficients a baseline
stream would carry, so progressive decode equals baseline decode
bit-for-bit at the same quality (tests assert exactly that).

Restart intervals (DRI + RSTn) are supported on BOTH paths, baseline
and progressive, encode and decode: the encoder byte-aligns and emits
RSTm every `restart_interval` MCUs (flushing pending progressive EOB
runs first), the decoder splits the entropy stream on the markers and
resets DC predictors / EOB runs — so camera/libjpeg streams, which
almost always carry DRI, decode here.

Out of scope (raise ValueError, routed as corrupt/unsupported by
decode_media): arithmetic coding, >2x sampling factors, 12-bit
precision, hierarchical (SOF3/5..15).

JPEG is lossy: round-trip tests assert PSNR-style bounds, not equality
(unlike the exact BMP/PNG/WAV codecs).
"""

from __future__ import annotations

import re
import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

# Annex K.1 luminance quantization table (quality 50 base)
_QUANT_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

# Annex K.2 chrominance quantization table (quality 50 base)
_QUANT_BASE_C = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3: luminance DC — code lengths histogram + symbol order
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# Annex K.4: chrominance DC
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))

# Annex K.5: luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K.6: chrominance AC
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag() -> np.ndarray:
    """Row-major block index for each zigzag position (spec traversal:
    anti-diagonals, alternating direction, starting (0,0),(0,1),(1,0))."""
    order = []
    for s in range(15):
        rs = list(range(max(0, s - 7), min(7, s) + 1))
        for r in (rs if s % 2 == 1 else reversed(rs)):
            order.append(r * 8 + (s - r))
    return np.array(order)


_ZZ = _zigzag()          # zigzag position -> row-major index
_INV_ZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _quant_table(quality: int, base: np.ndarray | None = None) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = ((base if base is not None else _QUANT_BASE) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _quant_table_c(quality: int) -> np.ndarray:
    return _quant_table(quality, _QUANT_BASE_C)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per the spec's canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# bit I/O (with 0xFF byte stuffing)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # de-stuff: 0xFF 0x00 -> 0xFF
        self.data = data.replace(b"\xff\x00", b"\xff")
        self.pos = 0       # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, stored bits) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_codes: dict, ac_codes: dict, prev_dc: int) -> int:
    """FDCT + quantize + Huffman-encode one centered 8x8 block; returns
    the new DC predictor."""
    coef = _DCT @ block @ _DCT.T
    qc = np.round(coef / q).astype(np.int32)
    zz = qc.flatten()[_ZZ]
    # DC (differential)
    size, bits = _magnitude(int(zz[0]) - prev_dc)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    # AC run-length
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]       # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]           # EOB
        bw.write(code, ln)
    return int(zz[0])


def _pad_to(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a float plane to (ph, pw)."""
    h, w = img.shape
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = img
    if ph > h:
        out[h:, :w] = img[-1:, :]
    if pw > w:
        out[:, w:] = out[:, w - 1:w]
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


class _SegmentedWriter:
    """Wraps _BitWriter with restart-interval segmentation [T.81 B.2.1.2
    DRI / E.1.4]: every `ri` MCUs the entropy stream is byte-aligned
    (1-padded), an RSTm marker (m cycling 0..7) is emitted, and the
    caller's DC predictors must reset. ri=0 degenerates to one
    unsegmented scan."""

    def __init__(self, ri: int) -> None:
        self.ri = ri
        self.bw = _BitWriter()
        self.parts: list[bytes] = []
        self.mcu = 0

    def next_mcu(self) -> bool:
        """Call before encoding each MCU; True => reset DC predictors."""
        if self.ri and self.mcu and self.mcu % self.ri == 0:
            m = len(self.parts) % 8
            self.parts.append(self.bw.flush()
                              + bytes([0xFF, 0xD0 + m]))
            self.bw = _BitWriter()
            self.mcu += 1
            return True
        self.mcu += 1
        return False

    def flush(self) -> bytes:
        self.parts.append(self.bw.flush())
        return b"".join(self.parts)


def encode_jpeg_gray(gray: np.ndarray, quality: int = 90,
                     restart_interval: int = 0) -> bytes:
    """Encode a HxW uint8 grayscale array as a baseline JFIF JPEG.
    restart_interval > 0 emits a DRI segment plus RSTn markers every
    that many MCUs (blocks), like most camera/libjpeg streams."""
    h, w = gray.shape
    q = _quant_table(quality)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    img = _pad_to(gray.astype(np.float64), ph, pw) - 128.0

    sw = _SegmentedWriter(restart_interval)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if sw.next_mcu():
                prev_dc = 0
            prev_dc = _encode_block(sw.bw, img[by:by + 8, bx:bx + 8], q,
                                    dc_codes, ac_codes, prev_dc)
    scan = sw.flush()

    out = bytearray(b"\xff\xd8")                                   # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(q.flatten()[_ZZ].astype(np.uint8)))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


def encode_jpeg_color(rgb: np.ndarray, quality: int = 90,
                      subsample: str = "420",
                      restart_interval: int = 0) -> bytes:
    """Encode a HxWx3 uint8 RGB array as a baseline JFIF YCbCr JPEG with
    4:2:0 (default) or 4:4:4 chroma, MCU-interleaved scan [T.81 B.2.3;
    JFIF 1.02 color transform]. restart_interval > 0 emits DRI + RSTn
    every that many interleaved MCUs."""
    if subsample not in ("420", "444"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    h, w, nc = rgb.shape
    if nc != 3:
        raise ValueError("encode_jpeg_color needs HxWx3 RGB")
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    # JFIF: planes stored centered at 0 (Y-128; Cb/Cr are already +-128)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    hs = vs = 2 if subsample == "420" else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    y = _pad_to(y, mcuy * mcu_h, mcux * mcu_w)
    cb = _pad_to(cb, mcuy * mcu_h, mcux * mcu_w)
    cr = _pad_to(cr, mcuy * mcu_h, mcux * mcu_w)
    if subsample == "420":
        # 2x2 mean downsample (matches the decoder's replicate upsample)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))

    qy, qc = _quant_table(quality), _quant_table_c(quality)
    dc_y = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_y = _canonical_codes(_AC_BITS, _AC_VALS)
    dc_c = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
    ac_c = _canonical_codes(_AC_BITS_C, _AC_VALS_C)

    sw = _SegmentedWriter(restart_interval)
    pdc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            if sw.next_mcu():
                pdc = [0, 0, 0]
            for v in range(vs):                       # Y blocks, raster
                for hh in range(hs):
                    by = (my * vs + v) * 8
                    bx = (mx * hs + hh) * 8
                    pdc[0] = _encode_block(sw.bw, y[by:by + 8, bx:bx + 8],
                                           qy, dc_y, ac_y, pdc[0])
            for ci, plane in ((1, cb), (2, cr)):      # one chroma block
                by, bx = my * 8, mx * 8
                pdc[ci] = _encode_block(sw.bw, plane[by:by + 8, bx:bx + 8],
                                        qc, dc_c, ac_c, pdc[ci])
    scan = sw.flush()

    samp = (hs << 4) | vs
    out = bytearray(b"\xff\xd8")                                   # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(qy.flatten()[_ZZ].astype(np.uint8)))
    out += _seg(0xFFDB, bytes([1]) + bytes(qc.flatten()[_ZZ].astype(np.uint8)))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFC4, bytes([0x01]) + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
    out += _seg(0xFFC4, bytes([0x11]) + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _SegmentedReader:
    """Decoder twin of _SegmentedWriter: splits entropy data on RSTn
    markers (in entropy data a 0xFF is always stuffed with 0x00, so a
    bare FF D0..D7 can only BE a restart marker) and swaps in a fresh
    _BitReader — discarding the previous segment's alignment padding —
    every `ri` MCUs. next_mcu() returning True tells the caller to reset
    its DC predictors [T.81 E.1.4]."""

    def __init__(self, scan: bytes, ri: int) -> None:
        self.segments = (re.split(b"\xff[\xd0-\xd7]", scan)
                         if ri else [scan])
        self.ri = ri
        self.idx = 0
        self.mcu = 0
        self.rd = _BitReader(self.segments[0])

    def next_mcu(self) -> bool:
        if self.ri and self.mcu and self.mcu % self.ri == 0:
            self.idx += 1
            if self.idx >= len(self.segments):
                raise ValueError("JPEG missing restart marker")
            self.rd = _BitReader(self.segments[self.idx])
            self.mcu += 1
            return True
        self.mcu += 1
        return False


def _decode_sym(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | rd.read_bit()
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _decode_block(rd: _BitReader, dct: dict, act: dict, q: np.ndarray,
                  prev_dc: int) -> tuple[np.ndarray, int]:
    """Huffman-decode + dequantize + IDCT one 8x8 block."""
    zz = np.zeros(64, dtype=np.int32)
    size = _decode_sym(rd, dct)
    prev_dc += _extend(rd.read_bits(size), size)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _decode_sym(rd, act)
        if sym == 0x00:                   # EOB
            break
        if sym == 0xF0:                   # ZRL
            k += 16
            if k > 64:
                raise ValueError("JPEG AC index overflow")
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(rd.read_bits(size), size)
        k += 1
    coef = (zz[_INV_ZZ].reshape(8, 8) * q).astype(np.float64)
    return _DCT.T @ coef @ _DCT, prev_dc


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """Decode a baseline JPEG: grayscale -> (HxW uint8, (h, w)); YCbCr
    color -> (HxWx3 uint8 RGB, (h, w, 3)), handling 4:4:4 / 4:2:0 /
    4:2:2 chroma via replicate upsample and DRI/RSTn restart intervals.
    Tables come from the file's own DQT/DHT segments. Raises ValueError
    on non-baseline-or-progressive (arithmetic, hierarchical, 12-bit) or
    corrupt streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []   # (cid, hs, vs, tq)
    scan_map: dict[int, tuple[int, int]] = {}     # cid -> (dc_id, ac_id)
    scan_order: list[int] = []
    scan = None
    ri = 0                                        # DRI restart interval
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        # legal inter-segment 0xFF fill bytes (ITU T.81 B.1.1.2): skip
        # any run of 0xFF preceding the marker code byte
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            # standalone (length-less) markers: TEM, RSTn outside a scan
            pos += 2
            continue
        if pos + 4 > len(payload):
            # truncated mid-segment: ValueError (never struct.error) so
            # decode_media's corrupt routing keeps working
            raise ValueError("JPEG truncated in marker stream")
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant)")
                tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int32)
                q[_ZZ] = tbl                      # stored in zigzag order
                quant[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xFFC2:
            # progressive DCT: hand the whole stream to the multi-scan
            # coefficient-domain decoder [T.81 Annex G]
            return _decode_progressive(payload)
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("unsupported JPEG (not baseline sequential)")
        elif marker == 0xFFC0:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG (depth={depth}, components={ncomp}; "
                    "need 8-bit, 1 or 3 components)")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG (sampling {hs}x{vs})")
                comps.append((cid, hs, vs, tq))
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(c, ln): sym
                                  for sym, (c, ln) in codes.items()}
                i += 17 + nv
        elif marker == 0xFFDA:
            ns = body[0]
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                scan_map[cs] = (tda >> 4, tda & 0x0F)
                scan_order.append(cs)
            # entropy data runs from after this segment to EOI
            scan_start = pos + 2 + ln
            end = payload.rfind(b"\xff\xd9")
            scan = payload[scan_start:end if end > 0 else len(payload)]
            break
        elif marker == 0xFFDD:
            if ln < 4:
                raise ValueError("JPEG truncated DRI segment")
            ri = struct.unpack_from(">H", body, 0)[0]
        pos += 2 + ln
    if scan is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan_order) != len(comps) \
            or any(cid not in scan_map for cid, *_ in comps):
        raise ValueError("unsupported JPEG (multi-scan / partial scan)")
    for cid, _hs, _vs, tq in comps:
        dc_id, ac_id = scan_map[cid]
        if tq not in quant or (0, dc_id) not in huff \
                or (1, ac_id) not in huff:
            raise ValueError("JPEG missing tables")

    sr = _SegmentedReader(scan, ri)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        # non-interleaved single-component scan: MCU = ONE block
        # [T.81 A.2.2], sampling factors do not tile the scan
        cid, _hs, _vs, tq = comps[0]
        dc_id, ac_id = scan_map[cid]
        dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
        q = quant[tq]
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        img = np.zeros((ph, pw), dtype=np.float64)
        prev_dc = 0
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                if sr.next_mcu():
                    prev_dc = 0
                img[by:by + 8, bx:bx + 8], prev_dc = _decode_block(
                    sr.rd, dct, act, q, prev_dc)
        out = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(out[:h, :w]), (int(h), int(w))

    # interleaved 3-component scan [T.81 B.2.3]: per MCU, each component
    # contributes vs x hs blocks in raster order
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
              for _cid, hs, vs, _tq in comps]
    pdc = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            if sr.next_mcu():
                pdc = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_id, ac_id = scan_map[cid]
                dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
                q = quant[tq]
                for v in range(vs):
                    for hh in range(hs):
                        by = (my * vs + v) * 8
                        bx = (mx * hs + hh) * 8
                        blk, pdc[ci] = _decode_block(
                            sr.rd, dct, act, q, pdc[ci])
                        planes[ci][by:by + 8, bx:bx + 8] = blk

    full = []
    for (cid, hs, vs, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                       hmax // hs, axis=1)
        full.append(up[:h, :w])
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(out), (int(h), int(w), 3)


def decode_jpeg_gray(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a baseline GRAYSCALE JPEG to HxW uint8 (the pre-color
    entrypoint; color streams raise like they always did here — use
    decode_jpeg for 3-component YCbCr)."""
    arr, shape = decode_jpeg(payload)
    if len(shape) != 2:
        raise ValueError(
            f"unsupported JPEG (components={shape[-1]}; need 8-bit "
            "grayscale — use decode_jpeg for color)")
    return arr, shape


# ---------------------------------------------------------------------------
# progressive DCT (SOF2) — T.81 Annex G
# ---------------------------------------------------------------------------

# Flat AC Huffman table for OUR progressive scans: every symbol byte
# except 0xFF at code length 8 (255 leaves of a 256-leaf depth-8 tree;
# the all-ones code stays unused as the spec expects). Annex K's
# sequential AC tables lack the EOBn symbols (0x10..0xE0) progressive
# scans emit, so a progressive encoder needs its own table anyway —
# a flat one keeps the canonical-code machinery honest at zero risk of
# a hand-transcription slip. ~1 byte/symbol is fine for fixtures; the
# DECODER reads whatever tables the file carries, flat or optimal.
_AC_BITS_P = [0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS_P = [v for v in range(256) if v != 0xFF]


def _entropy_end(payload: bytes, start: int) -> int:
    """First offset >= start holding a real marker (0xFF + non-stuffing,
    non-fill byte). Restart markers are out of scope, as in baseline."""
    i = start
    n = len(payload)
    while True:
        i = payload.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        nxt = payload[i + 1]
        if nxt == 0x00:
            i += 2
        elif nxt == 0xFF:
            i += 1
        elif 0xD0 <= nxt <= 0xD7:
            i += 2                   # restart marker: internal to the scan
        else:
            return i


def _comp_block_dims(h: int, w: int, hs: int, vs: int,
                     hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved (single-component-scan) block grid [T.81 A.2.2]:
    ceil over the component's own sample dims, NOT MCU-padded."""
    cw = (w * hs + hmax - 1) // hmax
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive(payload: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """Multi-scan coefficient-domain decode of a progressive JPEG:
    accumulate DC/AC first+refinement scans into per-component quantized
    coefficient grids, then dequantize + IDCT + upsample + color-convert
    once at the end [T.81 G.2; same algorithm family as libjpeg's
    jdphuff, re-derived from the spec text]."""
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []   # (cid, hs, vs, tq)
    coefs: list[np.ndarray] = []                  # per comp [by][bx][64] zigzag
    hmax = vmax = 1
    mcux = mcuy = 0
    ri = 0                                        # DRI restart interval
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        while pos + 2 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD7:
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("JPEG truncated in marker stream")
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant)")
                tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int32)
                q[_ZZ] = tbl
                quant[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(tc, th)] = {(c, cl): sym for sym, (c, cl)
                                  in _canonical_codes(bits, vals).items()}
                i += 17 + nv
        elif marker == 0xFFC2:
            if h is not None:
                raise ValueError("unsupported JPEG (multiple frames)")
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG (depth={depth}, components={ncomp})")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"unsupported JPEG (sampling {hs}x{vs})")
                comps.append((cid, hs, vs, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                     for _cid, hs, vs, _tq in comps]
        elif marker in (0xFFC0, 0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("unsupported JPEG (mixed frame types)")
        elif marker == 0xFFDD:
            if ln < 4:
                raise ValueError("JPEG truncated DRI segment")
            # DRI may change between scans; applies to scans after it
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:
            if h is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps: list[tuple[int, int, int]] = []  # (ci, dc_id, ac_id)
            for c in range(ns):
                cs, tda = body[1 + 2 * c], body[2 + 2 * c]
                ci = next((i for i, cc in enumerate(comps) if cc[0] == cs),
                          None)
                if ci is None:
                    raise ValueError("JPEG scan references unknown component")
                scan_comps.append((ci, tda >> 4, tda & 0x0F))
            ss, se, a = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            scan_start = pos + 2 + ln
            end = _entropy_end(payload, scan_start)
            _decode_prog_scan(
                _SegmentedReader(payload[scan_start:end], ri), huff,
                comps, coefs, scan_comps, ss, se, ah, al, h, w, hmax,
                vmax, mcux, mcuy)
            pos = end
            continue
        pos += 2 + ln
    if h is None or not coefs:
        raise ValueError("JPEG missing SOF/SOS")

    planes = []
    for (cid, hs, vs, tq), cf in zip(comps, coefs):
        if tq not in quant:
            raise ValueError("JPEG missing tables")
        q = quant[tq]
        nby, nbx = cf.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coef = (cf[by, bx][_INV_ZZ].reshape(8, 8) * q).astype(
                    np.float64)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _DCT.T @ coef @ _DCT
        planes.append(plane)
    if len(comps) == 1:
        out = np.clip(np.round(planes[0] + 128.0), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(out[:h, :w]), (int(h), int(w))
    full = []
    for (cid, hs, vs, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                       hmax // hs, axis=1)
        full.append(up[:h, :w])
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8)
    return np.ascontiguousarray(out), (int(h), int(w), 3)


def _decode_prog_scan(sr: _SegmentedReader, huff: dict, comps: list,
                      coefs: list, scan_comps: list, ss: int, se: int,
                      ah: int, al: int, h: int, w: int, hmax: int,
                      vmax: int, mcux: int, mcuy: int) -> None:
    """Decode one progressive scan into the coefficient grids. Restart
    markers (sr with ri > 0) reset the DC predictors and the pending EOB
    run at MCU boundaries [T.81 E.1.4 / G.1.1] — an MCU is one
    interleaved MCU in a multi-component DC scan, one block otherwise."""
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG progressive DC scan with Se != 0")
        # DC scan: interleaved MCU order when ns > 1, else the single
        # component's own (non-padded) block raster. Group blocks by
        # MCU so restart boundaries land between MCUs, not blocks.
        tables = []
        for ci, dc_id, _ac_id in scan_comps:
            if ah == 0 and (0, dc_id) not in huff:
                raise ValueError("JPEG missing tables")
            tables.append(huff.get((0, dc_id)))
        pred = [0] * len(scan_comps)
        if len(scan_comps) > 1:
            mcus = []
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for si, (ci, _d, _a) in enumerate(scan_comps):
                        _cid, hs, vs, _tq = comps[ci]
                        for v in range(vs):
                            for hh in range(hs):
                                mcu.append((si, ci,
                                            my * vs + v, mx * hs + hh))
                    mcus.append(mcu)
        else:
            si, (ci, _d, _a) = 0, scan_comps[0]
            _cid, hs, vs, _tq = comps[ci]
            cbh, cbw = _comp_block_dims(h, w, hs, vs, hmax, vmax)
            mcus = [[(si, ci, by, bx)]
                    for by in range(cbh) for bx in range(cbw)]
        for mcu in mcus:
            if sr.next_mcu():
                pred = [0] * len(scan_comps)
            for si, ci, by, bx in mcu:
                blk = coefs[ci][by, bx]
                if ah == 0:
                    size = _decode_sym(sr.rd, tables[si])
                    pred[si] += _extend(sr.rd.read_bits(size), size)
                    blk[0] = pred[si] << al
                else:
                    if sr.rd.read_bit():
                        blk[0] |= 1 << al
        return

    # AC scan: exactly one component [T.81 G.1.1.1.1]
    if len(scan_comps) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    ci, _dc_id, ac_id = scan_comps[0]
    if (1, ac_id) not in huff:
        raise ValueError("JPEG missing tables")
    act = huff[(1, ac_id)]
    _cid, hs, vs, _tq = comps[ci]
    cbh, cbw = _comp_block_dims(h, w, hs, vs, hmax, vmax)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for by in range(cbh):
        for bx in range(cbw):
            if sr.next_mcu():
                eobrun = 0           # EOB runs never cross a restart
            blk = coefs[ci][by, bx]
            rd = sr.rd
            if ah == 0:                          # first pass [G.1.2.2]
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _decode_sym(rd, act)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:              # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1    # EOBn
                        if r:
                            eobrun += rd.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _extend(rd.read_bits(s), s) << al
                    k += 1
            else:                                # refinement [G.1.2.3]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _decode_sym(rd, act)
                        r, s = sym >> 4, sym & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += rd.read_bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "JPEG refinement size != 1")
                            newval = p1 if rd.read_bit() else m1
                        while k <= se:
                            cv = int(blk[k])
                            if cv != 0:
                                if rd.read_bit() and (cv & p1) == 0:
                                    blk[k] = cv + (p1 if cv >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cv = int(blk[k])
                        if cv != 0 and rd.read_bit() and (cv & p1) == 0:
                            blk[k] = cv + (p1 if cv >= 0 else m1)
                        k += 1
                    eobrun -= 1


# ---------------------------------------------------------------------------
# progressive encoder
# ---------------------------------------------------------------------------


def _fdct_quant_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a centered padded plane ->
    int32 [nby][nbx][64] in zigzag order."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int32)
    for by in range(nby):
        for bx in range(nbx):
            coef = _DCT @ plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ _DCT.T
            out[by, bx] = np.round(coef / q).astype(np.int32).flatten()[_ZZ]
    return out


class _ProgACState:
    """Cross-block state of one progressive AC scan: the pending EOB run
    and (refinement only) the correction bits buffered BEHIND that run —
    they ride with the EOBn symbol, while a block's own correction bits
    ride with its next ZRL/coefficient symbol (local `br` in the
    refinement encoder). Invariant: be_bits nonempty => eobrun > 0."""

    def __init__(self, bw: _BitWriter, ac_codes: dict) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.be_bits: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            for b in self.be_bits:
                self.bw.write(b, 1)
            self.eobrun = 0
            self.be_bits = []


def _encode_ac_first(st: _ProgACState, vals: np.ndarray, ss: int, se: int,
                     al: int) -> None:
    """One block of an AC first pass [T.81 G.1.2.2]: point transform is
    divide-toward-zero, EOB runs accumulate across blocks."""
    r = 0
    for k in range(ss, se + 1):
        v = int(vals[k])
        v = (abs(v) >> al) * (1 if v >= 0 else -1)
        if v == 0:
            r += 1
            continue
        if st.eobrun:
            st.emit_eobrun()
        while r > 15:
            code, ln = st.ac[0xF0]
            st.bw.write(code, ln)
            r -= 16
        size, bits = _magnitude(v)
        code, ln = st.ac[(r << 4) | size]
        st.bw.write(code, ln)
        st.bw.write(bits, size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def _encode_ac_refine(st: _ProgACState, vals: np.ndarray, ss: int, se: int,
                      al: int) -> None:
    """One block of an AC refinement pass [T.81 G.1.2.3]: newly-nonzero
    coefficients get (run, sign) symbols; already-nonzero ones get
    correction bits, buffered behind any pending EOB run."""
    absv = [abs(int(vals[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    r = 0
    br: list[int] = []          # this block's correction bits
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.emit_eobrun()
            code, ln = st.ac[0xF0]
            st.bw.write(code, ln)
            r -= 16
            for b in br:
                st.bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.emit_eobrun()
        code, ln = st.ac[(r << 4) | 1]
        st.bw.write(code, ln)
        st.bw.write(1 if int(vals[k]) >= 0 else 0, 1)
        for b in br:
            st.bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be_bits.extend(br)
        if st.eobrun == 0x7FFF:
            st.emit_eobrun()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: str = "420",
                            restart_interval: int = 0) -> bytes:
    """Encode HxW uint8 grayscale or HxWx3 uint8 RGB as a PROGRESSIVE
    JFIF JPEG (SOF2) with a full successive-approximation scan script:
    interleaved DC at Al=1 + DC refinement, then per component AC
    Ss=1..63 at Al=1 + AC refinement. The script lands every quantized
    coefficient at full precision, so decoding reproduces the baseline
    encoder's pixels exactly at equal quality. restart_interval > 0
    emits DRI + RSTn in every scan (pending EOB runs are flushed before
    each restart, per G.1.1 — runs never cross a marker)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        hsvs = [(1, 1)]
        qts = [0]
    else:
        if subsample not in ("420", "444"):
            raise ValueError(f"unsupported subsample {subsample!r}")
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        s = 2 if subsample == "420" else 1
        hsvs = [(s, s), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [0, 1, 1]
    hmax = max(hs for hs, _ in hsvs)
    vmax = max(vs for _, vs in hsvs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtabs = {0: _quant_table(quality), 1: _quant_table_c(quality)}
    coefs = []
    for pi, ((hs, vs), plane) in enumerate(zip(hsvs, planes)):
        p = _pad_to(plane, mcuy * 8 * vmax, mcux * 8 * hmax)
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx
                          ).mean((1, 3))
        coefs.append(_fdct_quant_blocks(p, qtabs[qts[pi]]))

    dc_tabs = [_canonical_codes(_DC_BITS, _DC_VALS),
               _canonical_codes(_DC_BITS_C, _DC_VALS_C)]
    ac_flat = _canonical_codes(_AC_BITS_P, _AC_VALS_P)
    ncomp = len(planes)
    dc_ids = [0] + [1] * (ncomp - 1)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0])
                + bytes(qtabs[0].flatten()[_ZZ].astype(np.uint8)))
    if not gray:
        out += _seg(0xFFDB, bytes([1])
                    + bytes(qtabs[1].flatten()[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hs, vs) in enumerate(hsvs):
        sof += bytes([ci + 1, (hs << 4) | vs, qts[ci]])
    out += _seg(0xFFC2, sof)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    if not gray:
        out += _seg(0xFFC4, bytes([0x01]) + bytes(_DC_BITS_C)
                    + bytes(_DC_VALS_C))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS_P)
                + bytes(bytearray(_AC_VALS_P)))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int, scan: bytes) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, body) + scan

    # scan 1: DC first, all components interleaved, Al=1
    sw = _SegmentedWriter(restart_interval)
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            if sw.next_mcu():
                pred = [0] * ncomp
            for ci, (hs, vs) in enumerate(hsvs):
                for v in range(vs):
                    for hh in range(hs):
                        dc = int(coefs[ci][my * vs + v, mx * hs + hh, 0]) >> 1
                        size, bits = _magnitude(dc - pred[ci])
                        code, ln = dc_tabs[dc_ids[ci]][size]
                        sw.bw.write(code, ln)
                        if size:
                            sw.bw.write(bits, size)
                        pred[ci] = dc
    out += sos([(ci + 1, dc_ids[ci], 0) for ci in range(ncomp)],
               0, 0, 0, 1, sw.flush())

    # scan 2: DC refinement, Ah=1 -> Al=0 (raw bits, same block order)
    sw = _SegmentedWriter(restart_interval)
    for my in range(mcuy):
        for mx in range(mcux):
            sw.next_mcu()            # nothing to reset, still segments
            for ci, (hs, vs) in enumerate(hsvs):
                for v in range(vs):
                    for hh in range(hs):
                        sw.bw.write(int(coefs[ci][my * vs + v,
                                                  mx * hs + hh, 0]) & 1, 1)
    out += sos([(ci + 1, dc_ids[ci], 0) for ci in range(ncomp)],
               0, 0, 1, 0, sw.flush())

    # per component: AC first (Al=1) then AC refinement (Ah=1, Al=0)
    for ci, (hs, vs) in enumerate(hsvs):
        cbh, cbw = _comp_block_dims(h, w, hs, vs, hmax, vmax)
        for first in (True, False):
            sw = _SegmentedWriter(restart_interval)
            st = _ProgACState(sw.bw, ac_flat)
            for by in range(cbh):
                for bx in range(cbw):
                    # a pending EOB run may not cross the restart: emit
                    # it into the OLD segment before the marker
                    if sw.ri and sw.mcu and sw.mcu % sw.ri == 0:
                        st.emit_eobrun()
                    if sw.next_mcu():
                        st.bw = sw.bw
                    if first:
                        _encode_ac_first(st, coefs[ci][by, bx], 1, 63, 1)
                    else:
                        _encode_ac_refine(st, coefs[ci][by, bx], 1, 63, 0)
            st.emit_eobrun()
            out += sos([(ci + 1, 0, 0)], 1, 63,
                       0 if first else 1, 1 if first else 0, sw.flush())

    out += b"\xff\xd9"
    return bytes(out)
