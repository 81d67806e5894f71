"""Pure-Python MPEG-1 video codec (ISO/IEC 11172-2 subset) — the
motion-compensated inter-frame codec for the multimodal decode path.

This is the real MPEG-1 video coding layer, not a lookalike container:
sequence / GOP / picture / slice / macroblock syntax, I-, P- AND
B-pictures (bidirectional prediction with separate forward/backward
PMVs, the (f+b+1)>>1 interpolated average, anchor-first transmit order
and the standard one-anchor reorder buffer on decode), default intra
quantizer matrix with the standard zigzag scan, intra DC prediction,
differential motion vectors at any f_code 1..7 (motion_code VLC +
(f_code-1)-bit residual, modulus-32*f_rate wrap), coded-block-pattern
VLC, run/level DCT coefficient VLC with the standard escape coding,
skipped macroblocks in P (zero-vector co-located copy, PMV reset) AND
B pictures (previous MB's prediction mode + vectors repeated, PMVs
untouched, per 2.4.4.4), and half-pel chroma prediction (luma
vectors halve into chroma half-sample positions, truncating toward
zero).
The encoder emits a deliberately conservative-but-legal subset — one
slice per picture, full_pel_forward_vector=1, default matrices, and the
escape form for any run/level outside the short VLC table it carries —
while the decoder additionally handles half-pel luma vectors
(full_pel_forward_vector=0), loaded quantizer matrices, per-
macroblock quantizer changes, and mixed forward/backward f_codes, so
third-party streams inside the subset decode too.

Honesty note (same bar as operators/flac.py): the VLC tables are
transcribed from the published standard (Annex B) and the encoder and
decoder share one source of truth for them, so the round-trip tests
prove internal consistency plus syntax-level conformance (start codes,
marker bits, byte-aligned slices), but no third-party MPEG decoder
exists in this sandbox to cross-check bit-exactness of the tables
against. D-pictures remain out of subset and raise ValueError
(decode_media routes that as corrupt, never wrong pixels); a skipped
B macroblock directly after an intra macroblock has no prediction to
repeat and is refused as an illegal stream.

Recast anchor: the reference engine has no media path at all — this
module belongs to the training-data-pipeline extension surface
(SURVEY §2.11 multimodal columns), where video ships as opaque binary
and decode runs Arrow-batched inside mapInPandas so payloads never
enter a shuffle.
"""

from __future__ import annotations

import numpy as np

from webalizer_spark.operators.jpeg import _DCT, _ZZ

# ---------------------------------------------------------------------------
# tables (ISO 11172-2 Annex B; default matrices from 2.4.3.3)
# ---------------------------------------------------------------------------

_SEQ_START = b"\x00\x00\x01\xb3"
_GOP_START = b"\x00\x00\x01\xb8"
_PIC_START = b"\x00\x00\x01\x00"
_SEQ_END = b"\x00\x00\x01\xb7"

# default intra quantizer matrix, row-major (11172-2 2.4.3.3.1)
_INTRA_Q = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int64).reshape(8, 8)
_NONINTRA_Q = np.full((8, 8), 16, dtype=np.int64)

# B.1 macroblock_address_increment (value -> bitstring)
_MBA_CODES = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000", 26: "00000011111", 27: "00000011110",
    28: "00000011101", 29: "00000011100", 30: "00000011011",
    31: "00000011010", 32: "00000011001", 33: "00000011000",
}
_MBA_ESCAPE = "00000001000"           # adds 33, may repeat
_MBA_STUFF = "00000001111"            # discarded by the decoder

# B.2a / B.2b macroblock_type:
#   value = (quant, motion_forward, coded_pattern, intra)
_MBTYPE_I = {"1": (0, 0, 0, 1), "01": (1, 0, 0, 1)}
_MBTYPE_P = {
    "1": (0, 1, 1, 0),       # pred, MC, coded
    "01": (0, 0, 1, 0),      # pred, no MC, coded
    "001": (0, 1, 0, 0),     # pred, MC, not coded
    "00011": (0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 0),   # pred, MC, coded, +quant
    "00001": (1, 0, 1, 0),   # pred, no MC, coded, +quant
    "000001": (1, 0, 0, 1),  # intra +quant
}
# B.2c B-picture macroblock_type:
#   value = (quant, motion_forward, motion_backward, coded_pattern, intra)
_MBTYPE_B = {
    "10": (0, 1, 1, 0, 0),      # interpolated, not coded
    "11": (0, 1, 1, 1, 0),      # interpolated, coded
    "010": (0, 0, 1, 0, 0),     # backward, not coded
    "011": (0, 0, 1, 1, 0),     # backward, coded
    "0010": (0, 1, 0, 0, 0),    # forward, not coded
    "0011": (0, 1, 0, 1, 0),    # forward, coded
    "00011": (0, 0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 1, 0),   # interpolated, coded, +quant
    "000011": (1, 1, 0, 1, 0),  # forward, coded, +quant
    "000010": (1, 0, 1, 1, 0),  # backward, coded, +quant
    "000001": (1, 0, 0, 0, 1),  # intra +quant
}

# B.4 motion_code (signed value -> bitstring; negative = last bit set)
_MOTION_CODES = {0: "1"}
for _v, _c in [(1, "010"), (2, "0010"), (3, "00010"), (4, "0000110"),
               (5, "00001010"), (6, "00001000"), (7, "00000110"),
               (8, "0000010110"), (9, "0000010100"), (10, "0000010010"),
               (11, "00000100010"), (12, "00000100000"),
               (13, "00000011110"), (14, "00000011100"),
               (15, "00000011010"), (16, "00000011000")]:
    _MOTION_CODES[_v] = _c
    _MOTION_CODES[-_v] = _c[:-1] + "1"

# B.9 coded_block_pattern (cbp 6-bit value -> bitstring; bit 5 = Y0 ..
# bit 1 = Cb, bit 0 = Cr)
_CBP_CODES = {
    60: "111", 4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101", 59: "000000100",
    27: "000000011", 39: "000000010",
}

# B.12 / B.13 dct_dc_size
_DC_SIZE_Y = {0: "100", 1: "00", 2: "01", 3: "101", 4: "110",
              5: "1110", 6: "11110", 7: "111110", 8: "1111110"}
_DC_SIZE_C = {0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
              5: "11110", 6: "111110", 7: "1111110", 8: "11111110"}

# B.14 dct coefficients — the short-code subset the encoder emits
# directly; anything else goes through the (always-legal) escape form.
# (run, level) -> bitstring WITHOUT the sign bit.
_COEF_CODES = {
    (0, 1): "11",            # "1" when first coefficient of a non-intra block
    (1, 1): "011", (0, 2): "0100", (2, 1): "0101",
    (0, 3): "00101", (3, 1): "00111", (4, 1): "00110",
    (1, 2): "000110", (5, 1): "000111", (6, 1): "000101", (7, 1): "000100",
    (0, 4): "0000110", (2, 2): "0000100", (8, 1): "0000111",
    (9, 1): "0000101",
}
_EOB = "10"
_COEF_ESCAPE = "000001"


def _invert(codes: dict) -> dict:
    inv = {}
    for val, code in codes.items():
        if code in inv:
            raise ValueError(f"duplicate VLC code {code}")
        inv[code] = val
    # prefix-freeness check (tables are hand-transcribed — fail loudly)
    for a in inv:
        for b in inv:
            if a != b and b.startswith(a):
                raise ValueError(f"VLC prefix conflict {a} / {b}")
    return inv

_MBA_DEC = _invert(_MBA_CODES)
_MBA_DEC[_MBA_ESCAPE] = "escape"
_MBA_DEC[_MBA_STUFF] = "stuff"
_MOTION_DEC = _invert(_MOTION_CODES)
_CBP_DEC = _invert(_CBP_CODES)
_DC_Y_DEC = _invert(_DC_SIZE_Y)
_DC_C_DEC = _invert(_DC_SIZE_C)
_COEF_DEC = _invert(_COEF_CODES)


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, no byte stuffing — MPEG video relies on VLC
# structure, not stuffing, to avoid start-code emulation)
# ---------------------------------------------------------------------------


class _BW:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def code(self, bitstring: str) -> None:
        self.bits(int(bitstring, 2), len(bitstring))

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def raw(self, data: bytes) -> None:
        assert self.n == 0
        self.buf += data

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BR:
    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self.data = data
        self.pos = pos_bytes * 8

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("MPEG bitstream truncated")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def vlc(self, table: dict, what: str, maxlen: int = 14) -> object:
        code = ""
        for _ in range(maxlen):
            code += "01"[self.bit()]
            if code in table:
                return table[code]
        raise ValueError(f"invalid MPEG VLC for {what}: {code}")


# ---------------------------------------------------------------------------
# quantization (11172-2 2.4.4.2 / 2.4.4.3, with mismatch oddification)
# ---------------------------------------------------------------------------


def _dequant_intra(level: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    mag = (2 * np.abs(level).astype(np.int64) * qscale * w) >> 4
    even = (mag != 0) & (mag % 2 == 0)
    mag[even] -= 1                         # mismatch control: force odd
    return np.clip(np.sign(level) * mag, -2048, 2047)


def _dequant_nonintra(level: np.ndarray, qscale: int,
                      w: np.ndarray) -> np.ndarray:
    mag = ((2 * np.abs(level).astype(np.int64) + 1) * qscale * w) >> 4
    even = (mag != 0) & (mag % 2 == 0)
    mag[even] -= 1
    out = np.sign(level) * mag
    out[level == 0] = 0
    return np.clip(out, -2048, 2047)


def _quant_intra(coef: np.ndarray, qscale: int, w: np.ndarray) -> np.ndarray:
    num = 16 * np.abs(coef).astype(np.int64) + qscale * w
    lvl = num // (2 * qscale * w)
    return (np.sign(coef) * np.minimum(lvl, 255)).astype(np.int64)


def _quant_nonintra(coef: np.ndarray, qscale: int,
                    w: np.ndarray) -> np.ndarray:
    lvl = (16 * np.abs(coef).astype(np.int64)) // (2 * qscale * w)
    # level capped at 255 so the escape form always suffices (encoder
    # subset choice — coarser than ideal only at qscale<4)
    return (np.sign(coef) * np.minimum(lvl, 255)).astype(np.int64)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block.astype(np.float64) @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef.astype(np.float64) @ _DCT


# ---------------------------------------------------------------------------
# coefficient / DC / vector coding helpers
# ---------------------------------------------------------------------------


def _put_signed(bw: _BW, diff: int, size: int) -> None:
    bw.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _get_signed(br: _BR, size: int) -> int:
    if size == 0:
        return 0
    bits = br.bits(size)
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _put_coef(bw: _BW, run: int, level: int, first: bool) -> None:
    key = (run, abs(level))
    if key in _COEF_CODES and abs(level) > 0:
        code = _COEF_CODES[key]
        if first and key == (0, 1):
            code = "1"                     # dct_coeff_first special case
        bw.code(code)
        bw.bits(1 if level < 0 else 0, 1)
        return
    bw.code(_COEF_ESCAPE)
    bw.bits(run, 6)
    if -127 <= level <= 127 and level != 0:
        bw.bits(level & 0xFF, 8)
    elif 128 <= level <= 255:
        bw.bits(0x00, 8)
        bw.bits(level, 8)
    elif -255 <= level <= -128:
        bw.bits(0x80, 8)
        bw.bits(level & 0xFF, 8)
    else:
        raise ValueError(f"MPEG level out of escape range: {level}")


def _get_coefs(br: _BR, nonintra_first: bool) -> list[tuple[int, int]]:
    """Decode run/level pairs until EOB. Returns [(run, level), ...]."""
    out: list[tuple[int, int]] = []
    first = nonintra_first
    while True:
        b = br.bit()
        if b == 1:
            nxt = br.bit()
            if first:
                # dct_coeff_first: '1' '+sign' == (0, +-1); EOB illegal here
                out.append((0, -1 if nxt else 1))
                first = False
                continue
            if nxt == 0:
                return out                 # EOB '10'
            sign = br.bit()
            out.append((0, -1 if sign else 1))
            continue
        code = "0"
        for _ in range(16):
            code += "01"[br.bit()]
            if code == _COEF_ESCAPE:
                run = br.bits(6)
                lvl = br.bits(8)
                if lvl == 0x00:
                    lvl = br.bits(8)
                    if lvl < 128:
                        raise ValueError("MPEG bad escape level")
                elif lvl == 0x80:
                    lvl = br.bits(8) - 256
                    if lvl > -128:
                        raise ValueError("MPEG bad escape level")
                elif lvl >= 128:
                    lvl -= 256
                out.append((run, lvl))
                break
            if code in _COEF_DEC:
                run, mag = _COEF_DEC[code]
                sign = br.bit()
                out.append((run, -mag if sign else mag))
                break
        else:
            raise ValueError(f"invalid MPEG coefficient VLC: {code}")
        first = False


def _put_block_rle(bw: _BW, levels_zz: np.ndarray, first_nonintra: bool) -> None:
    """Emit run/level pairs for one zigzag-ordered level vector + EOB."""
    run = 0
    first = first_nonintra
    for lvl in levels_zz:
        if lvl == 0:
            run += 1
            continue
        _put_coef(bw, run, int(lvl), first)
        first = False
        run = 0
    bw.code(_EOB)


def _half(v: int) -> int:
    """Halve a motion vector with truncation TOWARD ZERO — the ISO
    11172-2 luma->chroma vector rule (Python's // floors, which is
    wrong for negative odd vectors)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _wrap_mv(diff: int, f_rate: int = 1) -> int:
    """Wrap a vector value into [-16*f_rate, 16*f_rate - 1] — the
    2.4.4.2 modulus-(32*f_rate) rule, f_rate = 1 << (f_code - 1)."""
    lo, span = -16 * f_rate, 32 * f_rate
    while diff > lo + span - 1:
        diff -= span
    while diff < lo:
        diff += span
    return diff


def _put_motion(bw: _BW, mv: int, pmv: int, f_rate: int = 1) -> None:
    """Encode one motion differential: wrap modulo 32*f_rate, emit the
    motion_code VLC, and for f_code > 1 the (f_code - 1)-bit residual
    (|d| = (|code| - 1) * f_rate + r + 1, per 2.4.4.2)."""
    d = _wrap_mv(mv - pmv, f_rate)
    if f_rate == 1 or d == 0:
        if d not in _MOTION_CODES:
            raise ValueError(f"motion code out of range: {d}")
        bw.code(_MOTION_CODES[d])
        return
    acode = -(-abs(d) // f_rate)           # ceil(|d| / f_rate) <= 16
    r = abs(d) - ((acode - 1) * f_rate + 1)
    code = acode if d > 0 else -acode
    if code not in _MOTION_CODES:
        raise ValueError(f"motion code out of range: {code}")
    bw.code(_MOTION_CODES[code])
    bw.bits(r, (f_rate).bit_length() - 1)


def _read_motion(br: "_BR", f_rate: int = 1) -> int:
    """Decode one motion differential (VLC + residual for f_code > 1)."""
    code = br.vlc(_MOTION_DEC, "motion_code")
    if f_rate == 1 or code == 0:
        return code
    r = br.bits((f_rate).bit_length() - 1)
    d = (abs(code) - 1) * f_rate + r + 1
    return d if code > 0 else -d


# ---------------------------------------------------------------------------
# motion-compensated prediction (half-sample capable, 2.4.4.2)
# ---------------------------------------------------------------------------


def _predict(ref: np.ndarray, y0: int, x0: int, bh: int, bw_: int,
             vy2: int, vx2: int) -> np.ndarray:
    """Forward prediction of a bh x bw_ block at (y0, x0) with a
    half-sample-unit vector (vy2, vx2); rounding per the standard's
    //2 and //4 averages."""
    iy, hy = vy2 >> 1, vy2 & 1
    ix, hx = vx2 >> 1, vx2 & 1
    ys, xs = y0 + iy, x0 + ix
    if ys < 0 or xs < 0 or ys + bh + hy > ref.shape[0] \
            or xs + bw_ + hx > ref.shape[1]:
        raise ValueError("MPEG motion vector points outside the picture")
    a = ref[ys:ys + bh, xs:xs + bw_].astype(np.int32)
    if not hy and not hx:
        return a
    if hy and not hx:
        b = ref[ys + 1:ys + 1 + bh, xs:xs + bw_].astype(np.int32)
        return (a + b + 1) >> 1
    if hx and not hy:
        b = ref[ys:ys + bh, xs + 1:xs + 1 + bw_].astype(np.int32)
        return (a + b + 1) >> 1
    b = ref[ys + 1:ys + 1 + bh, xs:xs + bw_].astype(np.int32)
    c = ref[ys:ys + bh, xs + 1:xs + 1 + bw_].astype(np.int32)
    d = ref[ys + 1:ys + 1 + bh, xs + 1:xs + 1 + bw_].astype(np.int32)
    return (a + b + c + d + 2) >> 2


# ---------------------------------------------------------------------------
# plane helpers
# ---------------------------------------------------------------------------


def _rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cbu = np.repeat(np.repeat(cb, 2, 0), 2, 1).astype(np.float64) - 128.0
    cru = np.repeat(np.repeat(cr, 2, 0), 2, 1).astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    r = yf + 1.402 * cru
    g = yf - 0.344136 * cbu - 0.714136 * cru
    b = yf + 1.772 * cbu
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


def _pad_mult(plane: np.ndarray, m: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % m, -w % m
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_intra_block(bw: _BW, plane: np.ndarray, by: int, bx: int,
                        qscale: int, pred_dc: int, chroma: bool) -> int:
    block = plane[by:by + 8, bx:bx + 8]
    coef = np.round(_fdct(block)).astype(np.int64)
    wq = _INTRA_Q
    dc = int(np.round(coef[0, 0] / 8.0))
    dc = max(0, min(255, dc))
    lv = _quant_intra(coef, qscale, wq)
    lv_zz = lv.reshape(64)[_ZZ]
    diff = dc - pred_dc
    size = int(abs(diff)).bit_length()
    table = _DC_SIZE_C if chroma else _DC_SIZE_Y
    if size > 8:
        raise ValueError("intra DC differential out of range")
    bw.code(table[size])
    if size:
        _put_signed(bw, diff, size)
    _put_block_rle(bw, lv_zz[1:], first_nonintra=False)
    return dc


def _recon_intra_block(dc: int, ac_zz: np.ndarray, qscale: int) -> np.ndarray:
    lv = np.zeros(64, dtype=np.int64)
    lv[_ZZ[1:]] = ac_zz[1:]
    coef = _dequant_intra(lv.reshape(8, 8), qscale, _INTRA_Q)
    coef[0, 0] = dc * 8
    return np.clip(np.round(_idct(coef)), 0, 255).astype(np.uint8)


def _encode_intra_mb(bw: _BW, y, cb, cr, rec_y, rec_cb, rec_cr,
                     py: int, px: int, cy: int, cx: int,
                     qscale: int, pred_dc: list[int]) -> None:
    """Emit + reconstruct one intra macroblock (shared by the I/P and
    B paths so the DC chain and recon rule live in exactly one place):
    four luma blocks chained through the Y DC predictor, then Cb/Cr;
    pred_dc mutates in place; recon planes are written directly."""
    pred_dc[0] = _encode_intra_block(bw, y, py, px, qscale,
                                     pred_dc[0], False)
    d2 = _encode_intra_block(bw, y, py, px + 8, qscale, pred_dc[0], False)
    d3 = _encode_intra_block(bw, y, py + 8, px, qscale, d2, False)
    pred_dc[0] = _encode_intra_block(bw, y, py + 8, px + 8, qscale,
                                     d3, False)
    pred_dc[1] = _encode_intra_block(bw, cb, cy, cx, qscale,
                                     pred_dc[1], True)
    pred_dc[2] = _encode_intra_block(bw, cr, cy, cx, qscale,
                                     pred_dc[2], True)
    for plane, rec, by0, bx0 in (
            (y, rec_y, py, px), (y, rec_y, py, px + 8),
            (y, rec_y, py + 8, px), (y, rec_y, py + 8, px + 8),
            (cb, rec_cb, cy, cx), (cr, rec_cr, cy, cx)):
        blk = plane[by0:by0 + 8, bx0:bx0 + 8]
        co = np.round(_fdct(blk)).astype(np.int64)
        lv = _quant_intra(co, qscale, _INTRA_Q)
        dcq = max(0, min(255, int(np.round(co[0, 0] / 8.0))))
        rec[by0:by0 + 8, bx0:bx0 + 8] = _recon_intra_block(
            dcq, lv.reshape(64)[_ZZ], qscale)


def _search_fullpel(cur32: np.ndarray, ref: np.ndarray, py: int, px: int,
                    search: int) -> tuple[int, int, int]:
    """Exhaustive full-pel 16x16 SAD search around (0,0); returns the
    TRUE (sad, dy, dx) of the winner — the zero-/short-vector
    preference only tie-breaks the search, it does not inflate the
    returned cost."""
    best = None
    best_sad = 0
    y0lo, y0hi = max(-py, -search), min(ref.shape[0] - py - 16, search)
    x0lo, x0hi = max(-px, -search), min(ref.shape[1] - px - 16, search)
    for dy in range(y0lo, y0hi + 1):
        for dx in range(x0lo, x0hi + 1):
            cand = ref[py + dy:py + dy + 16,
                       px + dx:px + dx + 16].astype(np.int32)
            sad = int(np.abs(cur32 - cand).sum())
            key = (sad + (0 if dy == dx == 0 else 1), abs(dy) + abs(dx))
            if best is None or key < best[0]:
                best = (key, dy, dx)
                best_sad = sad
    return best_sad, best[1], best[2]


def _refine_halfpel(cur32: np.ndarray, ref: np.ndarray, py: int, px: int,
                    sad: int, dy: int, dx: int) -> tuple[int, int, int]:
    """Half-sample refinement around an integer winner; vectors in
    half-sample units."""
    vy2, vx2 = 2 * dy, 2 * dx
    for ey in (-1, 0, 1):
        for ex in (-1, 0, 1):
            cy2, cx2 = 2 * dy + ey, 2 * dx + ex
            iy, hy = cy2 >> 1, cy2 & 1
            ix, hx = cx2 >> 1, cx2 & 1
            if (py + iy < 0 or px + ix < 0
                    or py + iy + 16 + hy > ref.shape[0]
                    or px + ix + 16 + hx > ref.shape[1]):
                continue
            cand = _predict(ref, py, px, 16, 16, cy2, cx2)
            s = int(np.abs(cur32 - cand).sum())
            if s < sad:
                sad, vy2, vx2 = s, cy2, cx2
    return sad, vy2, vx2


def _b_mb_pred(fwd, bwd, mode, py, px, cy, cx, vf, vb):
    """Prediction planes for one B macroblock: forward / backward /
    interpolated ((f + b + 1) >> 1), luma + both chroma."""
    parts = []
    if mode in ("fwd", "interp"):
        parts.append((
            _predict(fwd[0], py, px, 16, 16, vf[0], vf[1]),
            _predict(fwd[1], cy, cx, 8, 8, _half(vf[0]), _half(vf[1])),
            _predict(fwd[2], cy, cx, 8, 8, _half(vf[0]), _half(vf[1]))))
    if mode in ("bwd", "interp"):
        parts.append((
            _predict(bwd[0], py, px, 16, 16, vb[0], vb[1]),
            _predict(bwd[1], cy, cx, 8, 8, _half(vb[0]), _half(vb[1])),
            _predict(bwd[2], cy, cx, 8, 8, _half(vb[0]), _half(vb[1]))))
    if len(parts) == 1:
        return parts[0]
    return tuple((a + b + 1) >> 1 for a, b in zip(parts[0], parts[1]))


# B-picture mb_type codes by (motion_forward, motion_backward, coded)
_B_CODE = {(1, 1, 0): "10", (1, 1, 1): "11", (0, 1, 0): "010",
           (0, 1, 1): "011", (1, 0, 0): "0010", (1, 0, 1): "0011"}


def _encode_b_picture(bw: _BW, cur, fwd, bwd, qscale: int, search: int,
                      full_pel: bool, mb_w: int, mb_h: int,
                      f_rate: int = 1, stats: dict | None = None):
    """Macroblock layer of one B picture: per MB pick the cheapest of
    forward / backward / interpolated prediction (intra fallback),
    code residuals under the chosen prediction, keep separate
    forward/backward PMVs, and SKIP macroblocks whose residual under
    the previous MB's prediction (same mode + vectors, 2.4.4.4)
    quantizes to zero — the standard's cheap encoding of static B
    regions (first/last MB of the slice and MBs after an intra MB are
    never skipped, per the standard's constraints). Returns the
    reconstructed (y, cb, cr) planes — the decoder must match them
    bit-exactly."""
    y, cb, cr = cur
    rec_y = np.zeros_like(y)
    rec_cb = np.zeros_like(cb)
    rec_cr = np.zeros_like(cr)
    pred_dc = [128, 128, 128]
    pmv = {"f": [0, 0], "b": [0, 0]}       # [x, y] per direction
    prev = None          # (mf, mbk, vf, vb, vf2, vb2) of the last MB
    pending_inc = 1

    def _pred_for(mode, py, px, cy, cx, vf2, vb2):
        return _b_mb_pred(fwd, bwd, mode, py, px, cy, cx, vf2, vb2)

    def _zero_resid(pred, py, px, cy, cx):
        for byy in (0, 8):
            for bxx in (0, 8):
                res = (y[py + byy:py + byy + 8, px + bxx:px + bxx + 8]
                       .astype(np.int32)
                       - pred[0][byy:byy + 8, bxx:bxx + 8])
                lv = _quant_nonintra(np.round(_fdct(res)).astype(np.int64),
                                     qscale, _NONINTRA_Q)
                if np.any(lv):
                    return False
        for plane, pr in ((cb, pred[1]), (cr, pred[2])):
            res = plane[cy:cy + 8, cx:cx + 8].astype(np.int32) - pr
            lv = _quant_nonintra(np.round(_fdct(res)).astype(np.int64),
                                 qscale, _NONINTRA_Q)
            if np.any(lv):
                return False
        return True

    for my in range(mb_h):
        for mx in range(mb_w):
            py, px = my * 16, mx * 16
            cy, cx = my * 8, mx * 8
            is_last = my == mb_h - 1 and mx == mb_w - 1
            cur_y = y[py:py + 16, px:px + 16]
            cur32 = cur_y.astype(np.int32)

            if prev is not None:
                pmf, pmbk, pvf, pvb, pvf2, pvb2 = prev
                pmode = ("interp" if pmf and pmbk
                         else ("fwd" if pmf else "bwd"))
                try:
                    # the previous MB's vectors may point outside the
                    # picture AT THIS MB -> skipping here would be an
                    # illegal stream, so it is simply not eligible
                    ppred = _pred_for(pmode, py, px, cy, cx, pvf2, pvb2)
                except ValueError:
                    ppred = None
                if ppred is not None and _zero_resid(ppred, py, px, cy, cx):
                    if not is_last:
                        # SKIP: repeat the previous prediction, PMVs
                        # and prev unchanged, DC predictors reset
                        pending_inc += 1
                        if stats is not None:
                            stats["b_skipped"] = stats.get(
                                "b_skipped", 0) + 1
                        _b_recon_store(rec_y, rec_cb, rec_cr, ppred,
                                       py, px, cy, cx)
                        pred_dc = [128, 128, 128]
                        continue
                    # last MB of the slice must be coded: emit the
                    # previous mode, zero differentials, not coded
                    inc = pending_inc
                    while inc > 33:
                        bw.code(_MBA_ESCAPE)
                        inc -= 33
                    bw.code(_MBA_CODES[inc])
                    pending_inc = 1
                    pred_dc = [128, 128, 128]
                    bw.code(_B_CODE[(pmf, pmbk, 0)])
                    if pmf:
                        _put_motion(bw, pvf[1], pmv["f"][0], f_rate)
                        _put_motion(bw, pvf[0], pmv["f"][1], f_rate)
                        pmv["f"] = [pvf[1], pvf[0]]
                    if pmbk:
                        _put_motion(bw, pvb[1], pmv["b"][0], f_rate)
                        _put_motion(bw, pvb[0], pmv["b"][1], f_rate)
                        pmv["b"] = [pvb[1], pvb[0]]
                    if stats is not None:
                        stats["b_coded"] = stats.get("b_coded", 0) + 1
                    _b_recon_store(rec_y, rec_cb, rec_cr, ppred,
                                   py, px, cy, cx)
                    continue

            sf, dyf, dxf = _search_fullpel(cur32, fwd[0], py, px, search)
            sb, dyb, dxb = _search_fullpel(cur32, bwd[0], py, px, search)
            if full_pel:
                vf = (dyf, dxf)
                vb = (dyb, dxb)
                vf2 = (2 * dyf, 2 * dxf)
                vb2 = (2 * dyb, 2 * dxb)
            else:
                sf, fy2, fx2 = _refine_halfpel(cur32, fwd[0], py, px,
                                               sf, dyf, dxf)
                sb, by2, bx2 = _refine_halfpel(cur32, bwd[0], py, px,
                                               sb, dyb, dxb)
                vf, vf2 = (fy2, fx2), (fy2, fx2)
                vb, vb2 = (by2, bx2), (by2, bx2)
            pi = _pred_for("interp", py, px, cy, cx, vf2, vb2)
            si = int(np.abs(cur32 - pi[0]).sum())
            mode, sad = min((("fwd", sf), ("bwd", sb), ("interp", si)),
                            key=lambda t: t[1])
            intra_cost = int(np.abs(cur32 - int(cur32.mean())).sum())
            inc = pending_inc
            while inc > 33:
                bw.code(_MBA_ESCAPE)
                inc -= 33
            bw.code(_MBA_CODES[inc])
            pending_inc = 1
            if stats is not None:
                stats["b_coded"] = stats.get("b_coded", 0) + 1

            if intra_cost + 500 < sad:
                bw.code("00011")           # B intra
                _encode_intra_mb(bw, y, cb, cr, rec_y, rec_cb, rec_cr,
                                 py, px, cy, cx, qscale, pred_dc)
                pmv["f"] = [0, 0]
                pmv["b"] = [0, 0]
                prev = None                # skip after intra: illegal
                continue

            pred_dc = [128, 128, 128]
            mf = 1 if mode in ("fwd", "interp") else 0
            mbk = 1 if mode in ("bwd", "interp") else 0
            pred = pi if mode == "interp" else _pred_for(
                mode, py, px, cy, cx, vf2, vb2)
            blocks = []
            for byy in (0, 8):
                for bxx in (0, 8):
                    blocks.append(
                        cur_y[byy:byy + 8, bxx:bxx + 8].astype(np.int32)
                        - pred[0][byy:byy + 8, bxx:bxx + 8])
            blocks.append(cb[cy:cy + 8, cx:cx + 8].astype(np.int32)
                          - pred[1])
            blocks.append(cr[cy:cy + 8, cx:cx + 8].astype(np.int32)
                          - pred[2])
            levels, cbp = [], 0
            for bi, res in enumerate(blocks):
                lv = _quant_nonintra(np.round(_fdct(res)).astype(np.int64),
                                     qscale, _NONINTRA_Q)
                lz = lv.reshape(64)[_ZZ]
                levels.append(lz)
                if np.any(lz):
                    cbp |= 1 << (5 - bi)
            coded = 1 if cbp else 0
            bw.code(_B_CODE[(mf, mbk, coded)])
            if mf:
                _put_motion(bw, vf[1], pmv["f"][0], f_rate)
                _put_motion(bw, vf[0], pmv["f"][1], f_rate)
                pmv["f"] = [vf[1], vf[0]]
            if mbk:
                _put_motion(bw, vb[1], pmv["b"][0], f_rate)
                _put_motion(bw, vb[0], pmv["b"][1], f_rate)
                pmv["b"] = [vb[1], vb[0]]
            prev = (mf, mbk, vf, vb, vf2, vb2)
            recon = []
            if coded:
                bw.code(_CBP_CODES[cbp])
            for bi, lz in enumerate(levels):
                if cbp & (1 << (5 - bi)):
                    _put_block_rle(bw, lz, first_nonintra=True)
                    lvq = np.zeros(64, dtype=np.int64)
                    lvq[_ZZ] = lz
                    recon.append(np.round(_idct(_dequant_nonintra(
                        lvq.reshape(8, 8), qscale,
                        _NONINTRA_Q))).astype(np.int32))
                else:
                    recon.append(np.zeros((8, 8), dtype=np.int32))
            for bi, (byy, bxx) in enumerate(((0, 0), (0, 8),
                                             (8, 0), (8, 8))):
                rec_y[py + byy:py + byy + 8, px + bxx:px + bxx + 8] = \
                    np.clip(pred[0][byy:byy + 8, bxx:bxx + 8]
                            + recon[bi], 0, 255)
            rec_cb[cy:cy + 8, cx:cx + 8] = np.clip(pred[1] + recon[4],
                                                   0, 255)
            rec_cr[cy:cy + 8, cx:cx + 8] = np.clip(pred[2] + recon[5],
                                                   0, 255)
    return rec_y, rec_cb, rec_cr


def _b_recon_store(rec_y, rec_cb, rec_cr, pred, py, px, cy, cx) -> None:
    """Store a zero-residual B prediction into the recon planes."""
    rec_y[py:py + 16, px:px + 16] = np.clip(pred[0], 0, 255)
    rec_cb[cy:cy + 8, cx:cx + 8] = np.clip(pred[1], 0, 255)
    rec_cr[cy:cy + 8, cx:cx + 8] = np.clip(pred[2], 0, 255)


def encode_mpeg1(frames: np.ndarray, qscale: int = 8, gop: int = 8,
                 search: int = 7, recon_out: list | None = None,
                 full_pel: bool = True, b_frames: int = 0,
                 f_code: int = 1,
                 stats: dict | None = None) -> bytes:
    """Encode (nf, h, w, 3) uint8 RGB frames as an MPEG-1 video
    elementary stream (I/P — and with b_frames>0, B — pictures, 4:2:0,
    one slice per picture, default matrices). full_pel=True emits
    full-pel vectors; full_pel=False emits half-sample-unit vectors
    with a half-pel refinement pass after the integer search
    (exercising the interpolating prediction on both sides). b_frames
    inserts that many bidirectionally-predicted pictures between
    anchors (transmit order anchor-first, the standard reorder; B
    pictures are never reference frames; NOTE: with b_frames>0, gop
    counts ANCHORS — the I-picture period becomes gop*(b_frames+1)
    display frames). If `recon_out` is a list it
    receives the encoder's own reconstructed RGB frames in DISPLAY
    order — the decoder must reproduce these bit-exactly (closed-loop
    invariant; any mismatch means prediction drift)."""
    if frames.ndim != 4 or frames.shape[-1] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mpeg1 needs (nf, h, w, 3) uint8 RGB")
    if not 1 <= qscale <= 31:
        raise ValueError("qscale must be 1..31")
    if b_frames < 0:
        raise ValueError("b_frames must be >= 0")
    if not 1 <= f_code <= 7:
        raise ValueError("f_code must be 1..7")
    f_rate = 1 << (f_code - 1)
    # the reconstructed-vector range is [-16*f_rate, 16*f_rate - 1] in
    # TRANSMITTED units (full or half pel): the search radius must fit
    if (search if full_pel else 2 * search + 1) > 16 * f_rate - 1:
        raise ValueError("search radius exceeds the f_code vector range")
    nf, h, w = frames.shape[:3]
    if h % 2 or w % 2:
        raise ValueError("MPEG-1 4:2:0 needs even dimensions")
    if h > 4095 or w > 4095:
        raise ValueError("dimensions exceed the 12-bit header fields")

    bw = _BW()
    bw.raw(_SEQ_START)
    bw.bits(w, 12)
    bw.bits(h, 12)
    bw.bits(1, 4)         # pel_aspect_ratio: square
    bw.bits(3, 4)         # picture_rate: 25 fps
    bw.bits(0x3FFFF, 18)  # bit_rate: variable
    bw.bits(1, 1)         # marker
    bw.bits(0, 10)        # vbv_buffer_size
    bw.bits(0, 1)         # constrained_parameters_flag
    bw.bits(0, 1)         # load_intra_quantizer_matrix (default)
    bw.bits(0, 1)         # load_non_intra_quantizer_matrix (default)
    bw.align()
    bw.raw(_GOP_START)
    bw.bits(0, 25)        # time_code
    bw.bits(1, 1)         # closed_gop
    bw.bits(0, 1)         # broken_link
    bw.align()

    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    ref_y = ref_cb = ref_cr = None
    prev_anchor = None                     # forward reference for B
    recon_store: dict[int, np.ndarray] = {}

    if b_frames:
        if nf > 1024:
            raise ValueError(
                "b_frames needs nf <= 1024 (temporal_reference reorder)")
        anchors = list(range(0, nf, b_frames + 1))
        if anchors[-1] != nf - 1:
            anchors.append(nf - 1)
        plan: list[tuple[str, int]] = [("I", anchors[0])]
        for ai in range(1, len(anchors)):
            plan.append(("I" if ai % gop == 0 else "P", anchors[ai]))
            plan.extend(("B", d)
                        for d in range(anchors[ai - 1] + 1, anchors[ai]))
    else:
        plan = [("I" if fi % gop == 0 else "P", fi) for fi in range(nf)]

    for kind, fi in plan:
        is_i = kind == "I"
        y, cb, cr = _rgb_to_yuv420(frames[fi])
        y, cb, cr = _pad_mult(y, 16), _pad_mult(cb, 8), _pad_mult(cr, 8)

        bw.raw(_PIC_START)
        bw.bits(fi % 1024, 10)             # temporal_reference
        bw.bits({"I": 1, "P": 2, "B": 3}[kind], 3)
        bw.bits(0xFFFF, 16)                # vbv_delay: unknown
        if kind != "I":
            bw.bits(1 if full_pel else 0, 1)   # full_pel_forward_vector
            bw.bits(f_code, 3)             # forward_f_code
        if kind == "B":
            bw.bits(1 if full_pel else 0, 1)   # full_pel_backward_vector
            bw.bits(f_code, 3)             # backward_f_code
        bw.bits(0, 1)                      # extra_bit_picture
        bw.align()
        bw.raw(b"\x00\x00\x01\x01")        # slice 1 (whole picture)
        bw.bits(qscale, 5)
        bw.bits(0, 1)                      # extra_bit_slice

        if kind == "B":
            brec = _encode_b_picture(
                bw, (y, cb, cr), prev_anchor, (ref_y, ref_cb, ref_cr),
                qscale, search, full_pel, mb_w, mb_h, f_rate, stats)
            bw.align()
            if recon_out is not None:
                recon_store[fi] = _yuv420_to_rgb(*brec)[:h, :w]
            continue

        rec_y = np.zeros_like(y)
        rec_cb = np.zeros_like(cb)
        rec_cr = np.zeros_like(cr)

        pred_dc = [1024 // 8, 1024 // 8, 1024 // 8]   # Y, Cb, Cr (pel units)
        pmv_y = pmv_x = 0
        pending_inc = 1

        for my in range(mb_h):
            for mx in range(mb_w):
                py, px = my * 16, mx * 16
                cy, cx = my * 8, mx * 8
                cur_y = y[py:py + 16, px:px + 16]

                mv_y = mv_x = 0        # emitted units (full- or half-pel)
                vy2 = vx2 = 0          # half-sample units (prediction)
                use_intra = is_i
                if not is_i:
                    cur32 = cur_y.astype(np.int32)
                    sad_mc, by_, bx_ = _search_fullpel(cur32, ref_y,
                                                       py, px, search)
                    if full_pel:
                        vy2, vx2 = 2 * by_, 2 * bx_
                    else:
                        sad_mc, vy2, vx2 = _refine_halfpel(
                            cur32, ref_y, py, px, sad_mc, by_, bx_)
                    mv_y = _half(vy2) if full_pel else vy2
                    mv_x = _half(vx2) if full_pel else vx2
                    intra_cost = int(np.abs(
                        cur32 - int(cur32.mean())).sum())
                    use_intra = intra_cost + 500 < sad_mc

                if use_intra:
                    emit_type = "intra"
                else:
                    # residuals on all six blocks under the chosen vector
                    pred_yb = _predict(ref_y, py, px, 16, 16, vy2, vx2)
                    pred_cbb = _predict(ref_cb, cy, cx, 8, 8,
                                        _half(vy2), _half(vx2))
                    pred_crb = _predict(ref_cr, cy, cx, 8, 8,
                                        _half(vy2), _half(vx2))
                    blocks = []
                    for byy in (0, 8):
                        for bxx in (0, 8):
                            res = cur_y[byy:byy + 8, bxx:bxx + 8].astype(
                                np.int32) - pred_yb[byy:byy + 8, bxx:bxx + 8]
                            blocks.append(res)
                    blocks.append(cb[cy:cy + 8, cx:cx + 8].astype(np.int32)
                                  - pred_cbb)
                    blocks.append(cr[cy:cy + 8, cx:cx + 8].astype(np.int32)
                                  - pred_crb)
                    levels = []
                    cbp = 0
                    for bi, res in enumerate(blocks):
                        lv = _quant_nonintra(
                            np.round(_fdct(res)).astype(np.int64),
                            qscale, _NONINTRA_Q)
                        lz = lv.reshape(64)[_ZZ]
                        levels.append(lz)
                        if np.any(lz):
                            cbp |= 1 << (5 - bi)
                    if cbp == 0:
                        if mv_y == 0 and mv_x == 0:
                            is_last = my == mb_h - 1 and mx == mb_w - 1
                            is_first = pending_inc == 1 and my == 0 and mx == 0
                            if not is_last and not is_first:
                                emit_type = "skip"
                            else:
                                emit_type = "mc_notcoded"
                        else:
                            emit_type = "mc_notcoded"
                    else:
                        emit_type = "mc_coded"

                if emit_type == "skip":
                    # decoder copies co-located pels; resets PMV
                    rec_y[py:py + 16, px:px + 16] = ref_y[py:py + 16,
                                                          px:px + 16]
                    rec_cb[cy:cy + 8, cx:cx + 8] = ref_cb[cy:cy + 8,
                                                          cx:cx + 8]
                    rec_cr[cy:cy + 8, cx:cx + 8] = ref_cr[cy:cy + 8,
                                                          cx:cx + 8]
                    pending_inc += 1
                    pmv_y = pmv_x = 0
                    pred_dc = [128, 128, 128]
                    continue

                inc = pending_inc
                while inc > 33:
                    bw.code(_MBA_ESCAPE)
                    inc -= 33
                bw.code(_MBA_CODES[inc])
                pending_inc = 1

                if emit_type == "intra":
                    bw.code("1" if is_i else "00011")
                    _encode_intra_mb(bw, y, cb, cr, rec_y, rec_cb,
                                     rec_cr, py, px, cy, cx, qscale,
                                     pred_dc)
                    pmv_y = pmv_x = 0
                    continue

                # P macroblock with motion (coded or not)
                pred_dc = [128, 128, 128]
                if emit_type == "mc_notcoded":
                    bw.code("001")
                    _put_motion(bw, mv_x, pmv_x, f_rate)
                    _put_motion(bw, mv_y, pmv_y, f_rate)
                    pmv_x, pmv_y = mv_x, mv_y
                    rec_y[py:py + 16, px:px + 16] = np.clip(
                        _predict(ref_y, py, px, 16, 16, vy2, vx2), 0, 255)
                    rec_cb[cy:cy + 8, cx:cx + 8] = np.clip(pred_cbb, 0, 255)
                    rec_cr[cy:cy + 8, cx:cx + 8] = np.clip(pred_crb, 0, 255)
                    continue

                bw.code("1")                       # pred-mc, coded
                _put_motion(bw, mv_x, pmv_x, f_rate)
                _put_motion(bw, mv_y, pmv_y, f_rate)
                pmv_x, pmv_y = mv_x, mv_y
                bw.code(_CBP_CODES[cbp])
                recon = []
                for bi, lz in enumerate(levels):
                    if cbp & (1 << (5 - bi)):
                        _put_block_rle(bw, lz, first_nonintra=True)
                        lvq = np.zeros(64, dtype=np.int64)
                        lvq[_ZZ] = lz
                        res = np.round(_idct(_dequant_nonintra(
                            lvq.reshape(8, 8), qscale, _NONINTRA_Q)))
                    else:
                        res = np.zeros((8, 8))
                    recon.append(res.astype(np.int32))
                for bi, (byy, bxx) in enumerate(((0, 0), (0, 8),
                                                 (8, 0), (8, 8))):
                    rec_y[py + byy:py + byy + 8, px + bxx:px + bxx + 8] = \
                        np.clip(pred_yb[byy:byy + 8, bxx:bxx + 8]
                                + recon[bi], 0, 255)
                rec_cb[cy:cy + 8, cx:cx + 8] = np.clip(pred_cbb + recon[4],
                                                       0, 255)
                rec_cr[cy:cy + 8, cx:cx + 8] = np.clip(pred_crb + recon[5],
                                                       0, 255)

        bw.align()
        prev_anchor = (ref_y, ref_cb, ref_cr)
        ref_y, ref_cb, ref_cr = rec_y, rec_cb, rec_cr
        if recon_out is not None:
            recon_store[fi] = _yuv420_to_rgb(rec_y, rec_cb, rec_cr)[:h, :w]

    if recon_out is not None:
        recon_out.extend(recon_store[d] for d in sorted(recon_store))
    bw.align()
    bw.raw(_SEQ_END)
    return bw.bytes()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_matrix(br: _BR) -> np.ndarray:
    vals = np.array([br.bits(8) for _ in range(64)], dtype=np.int64)
    out = np.zeros(64, dtype=np.int64)
    out[_ZZ] = vals
    return out.reshape(8, 8)


def decode_mpeg1(payload: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """Decode an MPEG-1 video elementary stream (I/P/B subset) to
    ((nf, h, w, 3) uint8 RGB, shape) in DISPLAY order (anchor frames
    are held back one anchor period — the standard reorder buffer; B
    pictures emit immediately)."""
    if payload[:4] != _SEQ_START:
        raise ValueError("not an MPEG-1 video sequence")
    br = _BR(payload, 4)
    w = br.bits(12)
    h = br.bits(12)
    if w == 0 or h == 0:
        raise ValueError("MPEG zero picture dimension")
    br.bits(4)            # aspect
    br.bits(4)            # rate
    br.bits(18)           # bit_rate
    if br.bit() != 1:
        raise ValueError("MPEG sequence header marker bit missing")
    br.bits(10)           # vbv
    br.bits(1)            # constrained
    intra_q = _read_matrix(br) if br.bit() else _INTRA_Q
    nonintra_q = _read_matrix(br) if br.bit() else _NONINTRA_Q
    br.align()

    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    pw, ph = mb_w * 16, mb_h * 16
    ref_y = np.zeros((ph, pw), dtype=np.uint8)
    ref_cb = np.full((ph // 2, pw // 2), 128, dtype=np.uint8)
    ref_cr = np.full((ph // 2, pw // 2), 128, dtype=np.uint8)
    prev_y, prev_cb, prev_cr = ref_y, ref_cb, ref_cr   # forward ref for B
    frames: list[np.ndarray] = []
    pending: np.ndarray | None = None      # reorder buffer (one anchor)

    def next_start(br: _BR) -> int:
        """Advance to just past the next start code; -1 at stream end."""
        br.align()
        pos = br.pos >> 3
        while pos + 4 <= len(br.data):
            if br.data[pos:pos + 3] == b"\x00\x00\x01":
                br.pos = (pos + 4) * 8
                return br.data[pos + 3]
            pos += 1
        return -1

    def slice_done(br: _BR, mba: int) -> bool:
        """True when the current slice's macroblock layer is over: the
        picture's last MB decoded, or only zero padding remains before
        a byte-aligned start code."""
        if mba == mb_w * mb_h - 1:
            return True
        save = br.pos
        pad = (-br.pos) % 8
        try:
            if br.bits(pad) != 0:
                br.pos = save
                return False
            peek = br.pos >> 3
            return br.data[peek:peek + 3] == b"\x00\x00\x01"
        finally:
            br.pos = save

    sc = next_start(br)
    while sc not in (-1, 0xB7):
        if sc == 0xB8:                    # GOP header
            br.bits(27)
            sc = next_start(br)
            continue
        if sc == 0xB3:                    # repeated sequence header
            br.bits(62)
            if br.bit():
                _read_matrix(br)
            if br.bit():
                _read_matrix(br)
            sc = next_start(br)
            continue
        if sc != 0x00:                    # extension/user data: skip
            sc = next_start(br)
            continue

        br.bits(10)                       # temporal_reference
        ptype = br.bits(3)
        if ptype not in (1, 2, 3):
            raise ValueError(f"unsupported MPEG picture type {ptype}"
                             " (I/P/B subset)")
        br.bits(16)                       # vbv_delay
        full_pel = full_pel_b = 1
        fr_f = fr_b = 1
        if ptype in (2, 3):
            full_pel = br.bit()
            ffc = br.bits(3)
            if not 1 <= ffc <= 7:
                raise ValueError("forward_f_code out of range")
            fr_f = 1 << (ffc - 1)
        if ptype == 3:
            full_pel_b = br.bit()
            bfc = br.bits(3)
            if not 1 <= bfc <= 7:
                raise ValueError("backward_f_code out of range")
            fr_b = 1 << (bfc - 1)
        while br.bit():                   # extra_information_picture
            br.bits(8)

        sc = next_start(br)
        if not 0x01 <= sc <= 0xAF:
            raise ValueError("MPEG picture without slice")

        new_y = np.zeros_like(ref_y)
        new_cb = np.zeros_like(ref_cb)
        new_cr = np.zeros_like(ref_cr)

        while 0x01 <= sc <= 0xAF:
            qscale = br.bits(5)
            if qscale == 0:
                raise ValueError("MPEG quantizer_scale 0 is forbidden")
            while br.bit():
                br.bits(8)                # extra_information_slice
            mba = (sc - 1) * mb_w - 1
            pred_dc = [128, 128, 128]
            pmv_x = pmv_y = 0
            pmv_bx = pmv_by = 0            # backward PMV (B pictures)
            last_b = None                  # previous B MB's prediction
            first_in_slice = True
            while True:
                inc = 0
                while True:
                    v = br.vlc(_MBA_DEC, "macroblock_address_increment")
                    if v == "stuff":
                        continue
                    if v == "escape":
                        inc += 33
                        continue
                    inc += v
                    break
                # skipped macroblocks — P: zero-vector co-located copy
                # from the reference, PMV reset; B: repeat the PREVIOUS
                # macroblock's prediction mode and vectors, PMVs
                # untouched (2.4.4.4); skip after a B intra MB has no
                # defined prediction to repeat -> illegal stream
                if inc > 1 and first_in_slice:
                    raise ValueError("MPEG slice starts with a skip run")
                if inc > 1 and ptype == 3 and last_b is None:
                    raise ValueError(
                        "skipped B macroblock after an intra macroblock")
                for _ in range(inc - 1):
                    mba += 1
                    sy, sx = (mba // mb_w) * 16, (mba % mb_w) * 16
                    scy, scx = sy // 2, sx // 2
                    if ptype == 3:
                        lmf, lmbk, lvx, lvy, lvbx, lvby = last_b
                        parts_s = []
                        if lmf:
                            s2 = 2 if full_pel else 1
                            fy2, fx2 = s2 * lvy, s2 * lvx
                            parts_s.append((
                                _predict(prev_y, sy, sx, 16, 16, fy2, fx2),
                                _predict(prev_cb, scy, scx, 8, 8,
                                         _half(fy2), _half(fx2)),
                                _predict(prev_cr, scy, scx, 8, 8,
                                         _half(fy2), _half(fx2))))
                        if lmbk:
                            s2 = 2 if full_pel_b else 1
                            by2, bx2 = s2 * lvby, s2 * lvbx
                            parts_s.append((
                                _predict(ref_y, sy, sx, 16, 16, by2, bx2),
                                _predict(ref_cb, scy, scx, 8, 8,
                                         _half(by2), _half(bx2)),
                                _predict(ref_cr, scy, scx, 8, 8,
                                         _half(by2), _half(bx2))))
                        if len(parts_s) == 2:
                            sy_p, scb_p, scr_p = (
                                (a + b + 1) >> 1
                                for a, b in zip(parts_s[0], parts_s[1]))
                        else:
                            sy_p, scb_p, scr_p = parts_s[0]
                        new_y[sy:sy + 16, sx:sx + 16] = np.clip(
                            sy_p, 0, 255).astype(np.uint8)
                        new_cb[scy:scy + 8, scx:scx + 8] = np.clip(
                            scb_p, 0, 255).astype(np.uint8)
                        new_cr[scy:scy + 8, scx:scx + 8] = np.clip(
                            scr_p, 0, 255).astype(np.uint8)
                    else:
                        new_y[sy:sy + 16, sx:sx + 16] = ref_y[sy:sy + 16,
                                                              sx:sx + 16]
                        new_cb[scy:scy + 8, scx:scx + 8] = \
                            ref_cb[scy:scy + 8, scx:scx + 8]
                        new_cr[scy:scy + 8, scx:scx + 8] = \
                            ref_cr[scy:scy + 8, scx:scx + 8]
                        pmv_x = pmv_y = 0
                    pred_dc = [128, 128, 128]
                mba += 1
                first_in_slice = False
                if mba >= mb_w * mb_h:
                    raise ValueError("MPEG macroblock address overflow")
                py, px = (mba // mb_w) * 16, (mba % mb_w) * 16
                cy, cx = py // 2, px // 2

                if ptype == 3:
                    quant, mf, mbk, cp, intra = br.vlc(
                        _MBTYPE_B, "macroblock_type", maxlen=6)
                else:
                    table = _MBTYPE_I if ptype == 1 else _MBTYPE_P
                    quant, mf, cp, intra = br.vlc(
                        table, "macroblock_type", maxlen=6)
                    mbk = 0
                if quant:
                    qscale = br.bits(5)
                    if qscale == 0:
                        raise ValueError("MPEG quantizer_scale 0")
                mv_x = mv_y = mv_bx = mv_by = 0
                if mf:
                    dx = _read_motion(br, fr_f)
                    dy = _read_motion(br, fr_f)
                    mv_x = _wrap_mv(pmv_x + dx, fr_f)
                    mv_y = _wrap_mv(pmv_y + dy, fr_f)
                    pmv_x, pmv_y = mv_x, mv_y
                elif ptype != 3:
                    pmv_x = pmv_y = 0      # P no-MC: zero vector + reset
                if mbk:
                    dx = _read_motion(br, fr_b)
                    dy = _read_motion(br, fr_b)
                    mv_bx = _wrap_mv(pmv_bx + dx, fr_b)
                    mv_by = _wrap_mv(pmv_by + dy, fr_b)
                    pmv_bx, pmv_by = mv_bx, mv_by

                if intra:
                    last_b = None          # B-skip after intra: illegal
                    pmv_x = pmv_y = pmv_bx = pmv_by = 0
                    planes = ((new_y, py, px, 0), (new_y, py, px + 8, 0),
                              (new_y, py + 8, px, 0),
                              (new_y, py + 8, px + 8, 0),
                              (new_cb, cy, cx, 1), (new_cr, cy, cx, 2))
                    for plane, by, bx, ci in planes:
                        dct = _DC_C_DEC if ci else _DC_Y_DEC
                        size = br.vlc(dct, "dct_dc_size", maxlen=9)
                        diff = _get_signed(br, size)
                        dc = pred_dc[ci] + diff
                        if not 0 <= dc <= 255:
                            raise ValueError("MPEG intra DC out of range")
                        pred_dc[ci] = dc
                        pairs = _get_coefs(br, nonintra_first=False)
                        lz = np.zeros(64, dtype=np.int64)
                        zi = 0
                        for run, lvl in pairs:
                            zi += run + 1
                            if zi > 63:
                                raise ValueError("MPEG coefficient overrun")
                            lz[zi] = lvl
                        lvq = np.zeros(64, dtype=np.int64)
                        lvq[_ZZ] = lz
                        coefs = _dequant_intra(lvq.reshape(8, 8), qscale,
                                               intra_q)
                        coefs[0, 0] = dc * 8
                        plane[by:by + 8, bx:bx + 8] = np.clip(
                            np.round(_idct(coefs)), 0, 255).astype(np.uint8)
                    if slice_done(br, mba):
                        break
                    continue

                # inter prediction: P forward from the last anchor
                # (mf=0 means zero vector); B forward from the OLDER
                # anchor, backward from the newer, averaged when both
                pred_dc = [128, 128, 128]
                scale2 = 2 if full_pel else 1
                parts = []
                if ptype != 3 or mf:
                    fy2, fx2 = scale2 * mv_y, scale2 * mv_x
                    src = (prev_y, prev_cb, prev_cr) if ptype == 3 \
                        else (ref_y, ref_cb, ref_cr)
                    parts.append((
                        _predict(src[0], py, px, 16, 16, fy2, fx2),
                        _predict(src[1], cy, cx, 8, 8,
                                 _half(fy2), _half(fx2)),
                        _predict(src[2], cy, cx, 8, 8,
                                 _half(fy2), _half(fx2))))
                if ptype == 3 and mbk:
                    sb2 = 2 if full_pel_b else 1
                    by2, bx2 = sb2 * mv_by, sb2 * mv_bx
                    parts.append((
                        _predict(ref_y, py, px, 16, 16, by2, bx2),
                        _predict(ref_cb, cy, cx, 8, 8,
                                 _half(by2), _half(bx2)),
                        _predict(ref_cr, cy, cx, 8, 8,
                                 _half(by2), _half(bx2))))
                if not parts:
                    raise ValueError("MPEG B macroblock with no vectors")
                if len(parts) == 2:
                    pyb, pcb, pcr = ((a + b + 1) >> 1
                                     for a, b in zip(parts[0], parts[1]))
                else:
                    pyb, pcb, pcr = parts[0]
                cbp = br.vlc(_CBP_DEC, "coded_block_pattern",
                             maxlen=9) if cp else 0
                residual = []
                for bi in range(6):
                    if cbp & (1 << (5 - bi)):
                        pairs = _get_coefs(br, nonintra_first=True)
                        lz = np.zeros(64, dtype=np.int64)
                        zi = -1
                        for run, lvl in pairs:
                            zi += run + 1
                            if zi > 63:
                                raise ValueError("MPEG coefficient overrun")
                            lz[zi] = lvl
                        lvq = np.zeros(64, dtype=np.int64)
                        lvq[_ZZ] = lz
                        residual.append(np.round(_idct(_dequant_nonintra(
                            lvq.reshape(8, 8), qscale,
                            nonintra_q))).astype(np.int32))
                    else:
                        residual.append(np.zeros((8, 8), dtype=np.int32))
                for bi, (byy, bxx) in enumerate(((0, 0), (0, 8),
                                                 (8, 0), (8, 8))):
                    new_y[py + byy:py + byy + 8, px + bxx:px + bxx + 8] = \
                        np.clip(pyb[byy:byy + 8, bxx:bxx + 8]
                                + residual[bi], 0, 255).astype(np.uint8)
                new_cb[cy:cy + 8, cx:cx + 8] = np.clip(
                    pcb + residual[4], 0, 255).astype(np.uint8)
                new_cr[cy:cy + 8, cx:cx + 8] = np.clip(
                    pcr + residual[5], 0, 255).astype(np.uint8)
                if ptype == 3:
                    last_b = (mf, mbk, mv_x, mv_y, mv_bx, mv_by)

                if slice_done(br, mba):
                    break
            sc = next_start(br)

        rgb = _yuv420_to_rgb(new_y, new_cb, new_cr)[:h, :w]
        if ptype == 3:
            frames.append(rgb)             # B emits immediately
        else:
            prev_y, prev_cb, prev_cr = ref_y, ref_cb, ref_cr
            ref_y, ref_cb, ref_cr = new_y, new_cb, new_cr
            if pending is not None:
                frames.append(pending)     # release the held anchor
            pending = rgb

    if pending is not None:
        frames.append(pending)
    if not frames:
        raise ValueError("MPEG stream contains no pictures")
    out = np.stack(frames)
    return out, tuple(out.shape)
