"""Multimodal column plumbing: image/audio/video as opaque binary.

The reference treats payloads as opaque bytes it must sniff and
decode per-format (magic-byte dispatch: gzip 1f8b / zlib 78xx /
protobuf varint tags, crypto-ws-client/src/common/ws_client_internal.rs:643-797).
We reuse exactly that pattern for media blobs: a typed metadata
struct travels with the bytes; decode / feature-extract run as
Arrow-batched ``mapInPandas`` stages.

The actual codec libraries (PIL/ffmpeg/...) are NOT in this
container, so the decode kernel is a clearly-marked deterministic
stub (`_decode_stub`) — the Spark-side contract (schema, batching,
partitioning, null handling) is real and tested; swapping the stub
for a real decoder changes no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, format string, n_bytes int, "
    "feature array<float>, decode_error string"
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "riff_wav"),
    (b"\x1f\x8b", "gzip"),
    (b"\x00\x00\x00", "mp4ish"),
]


def sniff_format(payload: bytes | None) -> str:
    """Magic-byte format sniffing (the reference's decompression
    dispatch, ws_client_internal.rs:643-668)."""
    if payload is None or len(payload) == 0:
        return "empty"
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def _decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: real decode (PIL / soundfile /
    pyav) is unavailable in this container.  Produces a stable
    pseudo-feature from byte statistics so downstream plumbing
    (schemas, joins, ANN) is exercised end-to-end.  Replace the body
    with the real kernel on a cluster with codec libs installed."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array(
        [float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32
    )


def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature-extraction stage: binary -> fixed-dim
    float vector + sniffed format.  Arrow-batched; one python worker
    per partition; partition by media_id beforehand if blobs are
    huge so batches stay memory-bounded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": pdf["payload"].map(sniff_format),
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )
            feats = []
            errs = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    feats.append(None)
                    errs.append("empty payload: decode not attempted")
                else:
                    feats.append([float(x) for x in _decode_stub(bytes(b), feature_dim)])
                    errs.append(None)
            out["feature"] = feats
            out["decode_error"] = errs
            yield out

    # r7: per-blob python decode is map-side CPU — spread a narrow
    # scan across the cores first (no-op at real scan widths)
    from ..functions.partitioning import spread_small_scan

    return spread_small_scan(media.select("media_id", "kind", "payload")).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def gen_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    magics = [b"\x89PNG\r\n", b"RIFF....WAVE", b"\x00\x00\x00\x18ftyp"]
    rows = []
    for i in range(n):
        k = i % 3
        payload = magics[k] + bytes(rng.integers(0, 256, 64 + (i % 5) * 16).tolist())
        rows.append(
            (
                i,
                kinds[k],
                payload,
                (64 + i, 48 + i, 16000 if k == 1 else None, 30 if k == 2 else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
