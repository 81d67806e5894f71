"""Pure-Python baseline JPEG codec (grayscale, SOF0) — numpy + stdlib.

Closes the last external-library gap in operators/multimodal.py for
images: JFIF baseline sequential DCT, single component (grayscale),
8-bit, no subsampling. The ENCODER emits a spec-correct stream (SOI /
APP0 / DQT / SOF0 / DHT / SOS / EOI, Annex-K luminance tables scaled by
quality, canonical Huffman codes, 0xFF byte stuffing); the DECODER
parses DQT/SOF0/DHT/SOS from the FILE — not from compiled-in constants —
so any other tool's baseline grayscale JPEG decodes too, and a
transcription slip in our default tables could not self-cancel.

Out of scope (raise ValueError, routed as corrupt/unsupported by
decode_media): progressive (SOF2), arithmetic coding, multi-component
color, restart markers. Color/progressive remain on the external-lib
path (`_decode_real`).

JPEG is lossy: round-trip tests assert PSNR-style bounds, not equality
(unlike the exact BMP/PNG/WAV codecs).
"""

from __future__ import annotations

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

# Annex K.3: luminance DC — code lengths histogram + symbol order
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

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


def _quant_table(quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QUANT_BASE * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


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


def encode_jpeg_gray(gray: np.ndarray, quality: int = 90) -> bytes:
    """Encode a HxW uint8 grayscale array as a baseline JFIF JPEG."""
    h, w = gray.shape
    q = _quant_table(quality)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    img = np.empty((ph, pw), dtype=np.float64)
    img[:h, :w] = gray
    img[h:, :w] = gray[-1:, :]          # edge-replicate padding
    img[:, w:] = img[:, w - 1:w]
    img -= 128.0

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = img[by:by + 8, bx:bx + 8]
            coef = _DCT @ block @ _DCT.T
            qc = np.round(coef / q).astype(np.int32)
            zz = qc.flatten()[_ZZ]
            # DC (differential)
            size, bits = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
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
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")                                   # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(q.flatten()[_ZZ].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_gray(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a baseline grayscale JPEG to HxW uint8. Tables come from
    the file's own DQT/DHT segments. Raises ValueError on non-baseline /
    color / corrupt streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_dc = comp_ac = comp_q = 0
    scan = None
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
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("unsupported JPEG (not baseline sequential)")
        elif marker == 0xFFC0:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8 or ncomp != 1:
                raise ValueError(
                    f"unsupported JPEG (depth={depth}, components={ncomp}; "
                    "need 8-bit grayscale)")
            comp_q = body[8]      # [id, sampling, quant-table id]
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
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            # entropy data runs from after this segment to EOI
            scan_start = pos + 2 + ln
            end = payload.rfind(b"\xff\xd9")
            scan = payload[scan_start:end if end > 0 else len(payload)]
            break
        elif marker == 0xFFDD:
            raise ValueError("unsupported JPEG (restart intervals)")
        pos += 2 + ln
    if scan is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")
    if comp_q not in quant or (0, comp_dc) not in huff \
            or (1, comp_ac) not in huff:
        raise ValueError("JPEG missing tables")

    def decode_sym(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | rd.read_bit()
            ln += 1
            sym = table.get((code, ln))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    q = quant[comp_q]
    dct, act = huff[(0, comp_dc)], huff[(1, comp_ac)]
    rd = _BitReader(scan)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int32)
            size = decode_sym(rd, dct)
            prev_dc += _extend(rd.read_bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = decode_sym(rd, act)
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
            img[by:by + 8, bx:bx + 8] = _DCT.T @ coef @ _DCT
    out = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(out[:h, :w]), (int(h), int(w))
