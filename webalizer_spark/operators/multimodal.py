"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
small typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Python over mapInPandas (the only hot
path where Python is justified: codec libraries are not expressible as
Catalyst expressions).

The sandbox has no image/audio libraries, so the CODEC step is stubbed:
`_decode_real` raises NotImplementedError behind an import-try (PIL /
soundfile), and tests run against `_decode_fake`, a deterministic
parser of the generator's self-describing payload header. Everything
around the codec — schema, binary transport through Arrow, batch
iteration, partition-level batching, output schema — is real and tested;
swapping in a real codec changes ONE function.

Scale notes: payloads dominate bytes, so the plan NEVER shuffles them —
decode is a narrow mapInPandas straight after the scan, features are
extracted in the same pass, and only the (tiny) feature rows continue to
joins/aggregates. spark.sql.execution.arrow.maxRecordsPerBatch bounds
Python-worker memory per batch.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary,"
    " width int, height int, sample_rate int, n_frames int"
)

_MAGIC = b"WSMM"  # deterministic fake container: magic + dims + seeded bytes


def gen_media(out_dir: str, n: int = 200, seed: int = 42) -> str:
    """Deterministic media fixture: self-describing binary payloads."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        sr = int(rng.integers(8000, 48000)) if kind == "audio" else 0
        nf = int(rng.integers(4, 32)) if kind == "video" else 1
        body_len = w * h if kind == "image" else (nf * 64 if kind == "video" else 1024)
        body = rng.integers(0, 256, body_len, dtype=np.uint8).tobytes()
        payload = _MAGIC + struct.pack("<IIII", w, h, sr, nf) + body
        rows.append((i, kind, payload, w, h, sr, nf))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows]),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
        "height": pa.array([r[4] for r in rows], pa.int32()),
        "sample_rate": pa.array([r[5] for r in rows], pa.int32()),
        "n_frames": pa.array([r[6] for r in rows], pa.int32()),
    })
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "media.parquet")
    pq.write_table(tbl, path)
    return path


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real codec path — stubbed: the container has no PIL/soundfile/av."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/av; install on the "
            "cluster image and swap _decode_fake -> _decode_real") from e
    raise NotImplementedError("real decode not wired in this environment")


def _decode_fake(payload: bytes, kind: str) -> tuple[np.ndarray, tuple[int, ...]]:
    """Parse the deterministic fake container (magic + dims + bytes)."""
    assert payload[:4] == _MAGIC, "bad media payload"
    w, h, sr, nf = struct.unpack("<IIII", payload[4:20])
    body = np.frombuffer(payload[20:], dtype=np.uint8)
    if kind == "image":
        return body.reshape(h, w), (h, w)
    if kind == "video":
        return body.reshape(nf, 64), (nf, 64)
    return body, (len(body),)


FEATURE_SCHEMA = (
    "media_id bigint, kind string, ok boolean, mean_val double,"
    " std_val double, content_sha string, decoded_shape string"
)


def extract_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Decode + feature-extract in one Arrow-batched pass (no payload
    shuffle). Features: mean/std of decoded samples + content hash."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    arr, shape = _decode_fake(bytes(payload), kind)
                    out.append((int(mid), kind, True, float(arr.mean()),
                                float(arr.std()),
                                hashlib.sha256(arr.tobytes()).hexdigest()[:16],
                                "x".join(map(str, shape))))
                except Exception:  # noqa: BLE001 — corrupt media -> errors row
                    out.append((int(mid), kind, False, None, None, None, None))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "ok", "mean_val", "std_val",
                "content_sha", "decoded_shape"])

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id bigint, out_w int, out_h int, resized_sha string"


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize on decoded image arrays (pure numpy — the
    real path would call PIL; the plumbing is identical)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "image":
                    continue
                arr, (h, w) = _decode_fake(bytes(payload), kind)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = arr[np.ix_(yi, xi)]
                out.append((int(mid), out_w, out_h,
                            hashlib.sha256(small.tobytes()).hexdigest()[:16]))
            yield pd.DataFrame(out, columns=["media_id", "out_w", "out_h",
                                             "resized_sha"])

    return media.mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_mean double"


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video payloads: every Nth frame -> one row
    (the fan-out shape a video pipeline needs; frames stay small)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                arr, (nf, _) = _decode_fake(bytes(payload), kind)
                for fi in range(0, nf, every):
                    out.append((int(mid), fi, float(arr[fi].mean())))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx",
                                             "frame_mean"])

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)
