"""Motion-JPEG in AVI (RIFF) — the real-world intra-only compressed
video format, pure numpy + stdlib.

Closes the compressed-video gap in operators/multimodal.py: each frame
is a self-contained baseline JPEG (operators/jpeg.py — DCT + canonical
Huffman, grayscale or YCbCr color), wrapped in a spec-correct AVI
container (RIFF 'AVI ' / LIST hdrl with avih + strl(strh 'vids'/'MJPG' +
strf BITMAPINFOHEADER) / LIST movi with '00dc' chunks / idx1 index) that
any ffmpeg/VLC opens. Intra-only means every frame is independently
decodable — exactly the property a frame-sampling training pipeline
wants, since sampling every Nth frame never needs inter-frame state.

The DECODER walks the RIFF chunk tree from the file (tolerating unknown
chunks), so MJPEG-AVIs produced by other tools decode too as long as
their frames are baseline/progressive JPEG. Inter-frame codecs
(H.264/VP9 in mp4/webm) remain the external-library path — motion
compensation is genuinely out of scope for a pure-numpy codec.

MJPEG is lossy per frame: round-trip tests assert per-frame equality
with the frame-level JPEG codec (exact by construction) plus error
bounds vs the source frames.
"""

from __future__ import annotations

import struct

import numpy as np

from webalizer_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
                     quality: int = 90) -> bytes:
    """Encode (nf, h, w) uint8 grayscale or (nf, h, w, 3) uint8 RGB
    frames as an MJPEG AVI. fps is (rate, scale) — e.g. (30000, 1001)
    for NTSC — stored in strh exactly, no float rounding."""
    if frames.ndim not in (3, 4) or frames.shape[0] < 1:
        raise ValueError("encode_avi_mjpeg needs (nf, h, w[, 3]) frames")
    nf, h, w = frames.shape[:3]
    color = frames.ndim == 4
    rate, scale = fps
    usec_per_frame = scale * 1_000_000 // rate

    jpegs = [encode_jpeg_color(f, quality) if color
             else encode_jpeg_gray(f, quality) for f in frames]
    max_buf = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, max_buf * rate // max(scale, 1), 0,
        0x10,                       # AVIF_HASINDEX
        nf, 0, 1, max_buf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, scale, rate, 0,
                          nf, max_buf, 10000, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(j))
        movi_body += _chunk(b"00dc", j)
    riff_body = b"AVI " + hdrl + _chunk(b"LIST", movi_body) \
        + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """Decode an MJPEG AVI to ((nf, h, w) or (nf, h, w, 3) uint8,
    shape). Walks the RIFF tree for LIST-movi '00dc'/'00db' chunks and
    decodes each as a JPEG; unknown chunks are skipped, malformed
    structure raises ValueError (decode_media routes that as corrupt)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    frames: list[np.ndarray] = []

    def walk(data: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("AVI chunk overruns its parent")
            if fourcc == b"LIST":
                listtype = data[pos + 8:pos + 12]
                walk(data, pos + 12, body_end, listtype == b"movi")
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(decode_jpeg(data[pos + 8:body_end])[0])
            pos = body_end + (size & 1)          # even-byte chunk padding

    walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0], False)
    if not frames:
        raise ValueError("AVI contains no video frames")
    shape0 = frames[0].shape
    if any(f.shape != shape0 for f in frames):
        raise ValueError("AVI frames disagree on dimensions")
    out = np.stack(frames)
    return out, tuple(out.shape)
