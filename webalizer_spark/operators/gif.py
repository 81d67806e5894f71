"""Pure-Python GIF87a/89a codec (LZW) — numpy + stdlib.

Extends the multimodal family (operators/multimodal.py) with the other
image format a web-scraped training corpus is full of: palette-indexed
GIF, static AND animated. Like the PNG/FLAC codecs here — and unlike
the lossy JPEG — GIF is LOSSLESS for palettized content, so round-trip
tests assert byte-exact equality.

ENCODER: logical screen descriptor + global color table, real
variable-width LZW (dictionary growth to 4096, CLEAR resets, LSB-first
bit packing, 255-byte sub-blocks), GIF89a graphic-control extensions
(per-frame delay, disposal, transparency), NETSCAPE 2.0 loop extension
for animations, optional interlaced row order. Input: (h, w) uint8
grayscale (256-gray palette) or (h, w, 3) / (nf, h, w, 3) uint8 RGB
with <= 256 distinct colors (exact palette; quantization is a model
choice, not a codec concern — more colors raise ValueError).

DECODER: walks the block stream from the FILE (screen descriptor,
global/local color tables, extension blocks, image descriptors),
inflates LZW including the KwKwK corner case, de-interlaces, and
composites animation frames per the 89a disposal model (1 keep,
2 restore-to-background, 3 restore-to-previous) with transparent-index
pass-through — so GIFs produced by other tools decode too. Malformed
streams raise ValueError (decode_media routes them as corrupt).

Reference parity: the upstream engine ships static PNG/GIF report
images via its bundled webalizer.png assets `[webalizer.c ƒwrite_html
(U)]`; here the codec is a first-class decode path for media columns.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    """LSB-first bit packer (GIF appendix F), the mirror image of the
    JPEG codec's MSB-first writer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LsbBitWriter()
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    bw.write(clear, width)
    prev = -1
    for k in map(int, indices):
        if prev < 0:
            prev = k
            continue
        got = table.get((prev, k))
        if got is not None:
            prev = got
            continue
        bw.write(prev, width)
        table[(prev, k)] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            bw.write(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = k
    if prev >= 0:
        bw.write(prev, width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_out: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_out:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    if len(out) < n_out:
        raise ValueError("GIF LZW output short")
    return np.frombuffer(bytes(out[:n_out]), dtype=np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _palettize(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(nf,h,w,3) RGB -> (palette (p,3), indices (nf,h,w)). Exact: >256
    distinct colors is a refusal, not a silent quantization."""
    flat = frames.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"encode_gif needs <=256 distinct colors, got {len(pal)}; "
            "quantize upstream")
    return pal, inv.astype(np.uint8).reshape(frames.shape[:3])


def encode_gif(img: np.ndarray, delays_cs: list[int] | None = None,
               interlace: bool = False, transparent_index: int | None = None,
               loop: int = 0) -> bytes:
    """Encode (h, w) uint8 grayscale, (h, w, 3) uint8 RGB, or
    (nf, h, w, 3) uint8 RGB frames as a GIF. Multi-frame input emits an
    89a animation (delays_cs: per-frame delay in centiseconds, default
    10; NETSCAPE loop extension, loop=0 meaning forever); palettized
    content round-trips losslessly."""
    if img.dtype != np.uint8:
        raise ValueError("encode_gif needs uint8")
    if img.ndim == 2:
        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = img[None, ...]
    elif img.ndim == 3 and img.shape[-1] == 3:
        pal, idx = _palettize(img[None, ...])
    elif img.ndim == 4 and img.shape[-1] == 3:
        pal, idx = _palettize(img)
    else:
        raise ValueError("encode_gif needs (h,w), (h,w,3) or (nf,h,w,3)")
    nf, h, w = idx.shape
    animated = nf > 1
    pal_bits = max(1, int(len(pal) - 1).bit_length())
    gct = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    gct[:len(pal)] = pal
    mcs = max(2, pal_bits)                # LZW min code size >= 2

    out = bytearray(b"GIF89a" if animated or transparent_index is not None
                    else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += gct.tobytes()
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0" \
            + _sub_blocks(struct.pack("<BH", 1, loop))
    delays = delays_cs or [10] * nf
    for fi in range(nf):
        if animated or transparent_index is not None:
            packed = 1 << 2                       # disposal 1 (keep)
            tidx = 0
            if transparent_index is not None:
                packed |= 1
                tidx = transparent_index
            out += b"\x21\xf9" + bytes([4, packed]) \
                + struct.pack("<H", delays[fi] if animated else 0) \
                + bytes([tidx, 0])
        rows = idx[fi]
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, step) for s, step in _INTERLACE])
            rows = rows[order]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        out += bytes([mcs]) + _sub_blocks(_lzw_encode(rows.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """Decode a GIF to ((nf, h, w, 3) uint8 RGB, shape) — nf == 1 for a
    static image. Composites animation frames over the logical screen
    per the 89a disposal + transparency model."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("GIF truncated header")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if len(payload) < pos + 3 * n:
            raise ValueError("GIF truncated color table")
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    screen = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]
    frames: list[np.ndarray] = []
    disposal = 0
    transparent: int | None = None
    prev_screen = screen.copy()

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("GIF truncated sub-blocks")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:                          # trailer
            break
        if block == 0x21:                          # extension
            if pos + 1 > len(payload):
                raise ValueError("GIF truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 7
                transparent = payload[pos + 4] if flags & 1 else None
            pos = skip_subblocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB",
                                                        payload, pos)
        pos += 9
        if left + fw > w or top + fh > h:
            raise ValueError("GIF frame exceeds logical screen")
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            ct = np.frombuffer(payload[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without color table")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("GIF bad LZW min code size")
        data = bytearray()
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            data += payload[pos:pos + ln]
            pos += ln
        idx = _lzw_decode(bytes(data), mcs, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:                         # interlaced
            out_rows = np.empty((fh, fw), dtype=np.uint8)
            src = 0
            for start, step in _INTERLACE:
                n_rows = len(range(start, fh, step))
                out_rows[start::step] = idx[src:src + n_rows]
                src += n_rows
            idx = out_rows
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF index outside color table")
        prev_screen = screen.copy()
        region = screen[top:top + fh, left:left + fw]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(screen.copy())
        if disposal == 2:                          # restore to background
            bg_rgb = (ct[bg] if gct is not None and bg < len(gct)
                      else np.zeros(3, dtype=np.uint8))
            screen[top:top + fh, left:left + fw] = bg_rgb
        elif disposal == 3:                        # restore to previous
            screen = prev_screen.copy()
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no frames")
    out = np.stack(frames)
    return out, tuple(out.shape)
