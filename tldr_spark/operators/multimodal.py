"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions parsed from the synthetic header) so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

A production swap replaces ONLY the ``_decode_one`` body with e.g.
PIL.Image.open(io.BytesIO(payload)); everything else (the mapInPandas
shape, the schema, the repartition-by-size strategy) is unchanged.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, n_frames int"
FEATURE_SCHEMA = "media_id long, kind string, width int, height int, n_frames int, mean_byte double, n_bytes long"

_MAGIC = b"SYNM"  # synthetic media header: magic | kind(1B) | w | h | frames


def encode_fake_media(media_id: int, kind: str, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic synthetic media payload (tests + generators)."""
    header = _MAGIC + kind[:1].encode() + struct.pack("<iii", width, height, n_frames)
    body = bytes((media_id * 7 + i) % 256 for i in range(64))
    return header + body


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int, float, int]:
    if payload[:4] == _MAGIC:
        w, h, n = struct.unpack("<iii", payload[5:17])
        body = payload[17:]
        mean = sum(body) / len(body) if body else 0.0
        return w, h, n, mean, len(payload)
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/av — not available in this "
            "container; pass fake=True or swap _decode_one in production"
        )
    return 0, 0, 0, 0.0, len(payload)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, width, height, n_frames, mean_byte, n_bytes) —
    the decode/feature-extract stage as Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, n, mean, size = _decode_one(bytes(payload), fake)
                rows.append((mid, kind, w, h, n, mean, size))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_frames", "mean_byte", "n_bytes"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """(media_id, frame_no) — video frame sampling as a generator-style
    mapInPandas (1→many rows), the shape a real frame extractor uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, n_frames, _, _ = _decode_one(bytes(payload), fake)
                out.extend((mid, f) for f in range(0, n_frames, every_n))
            yield pd.DataFrame(out, columns=["media_id", "frame_no"])

    return media.select("media_id", "payload").mapInPandas(run, "media_id long, frame_no int")


def synth_media(spark, n: int = 20) -> DataFrame:
    """Deterministic media table for tests."""
    rows = [
        (
            i,
            ["image", "audio", "video"][i % 3],
            encode_fake_media(i, ["image", "audio", "video"][i % 3], 16 + i, 9 + i, 1 + (i % 3) * 5),
            16 + i,
            9 + i,
            1 + (i % 3) * 5,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
