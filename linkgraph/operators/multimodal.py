"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata, processed in
Arrow batches via mapInPandas — the schema, partitioning, UDF
signatures and batch shapes are real and tested; the actual
codec work is STUBBED (no image/audio libraries in this container):
``decode_image_real`` raises NotImplementedError, and the default
pipeline uses a deterministic fake decoder so the distributed
plumbing is exercisable end-to-end. Swapping in PIL/ffmpeg later
changes one function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, duration_ms int"
)
FEATURE_SCHEMA = "media_id long, kind string, feat array<float>, n_bytes int"


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                payload = bytes(bytearray((i * 31 + j) % 256 for j in range(128 + i % 64)))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": 32 + i % 8 if kind == "image" else 0,
                        "height": 32 + i % 4 if kind == "image" else 0,
                        "duration_ms": 1000 * (1 + i % 5) if kind != "image" else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image_real(payload: bytes) -> np.ndarray:
    """The real decoder slot. Container has no codec libs."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg — not available in this environment; "
        "fake_decode is used for plumbing tests"
    )


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in 'decode': fixed-dim float features from
    payload byte statistics. Same signature/shape as a real embedder."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, dim)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(media: DataFrame, dim: int = 8, use_real_decoder: bool = False) -> DataFrame:
    """binary payload → feature vector, Arrow-batched mapInPandas.
    Partition-parallel; one pandas batch per Arrow chunk; no
    per-row Python round trips."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decode_image_real if use_real_decoder else fake_decode
        for b in batches:
            feats = [decode(bytes(p), dim) if not use_real_decoder else decode(bytes(p)) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "feat": [f.tolist() for f in feats],
                    "n_bytes": [len(bytes(p)) for p in b["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, target_w int, target_h int, payload binary"
)


def resize_images(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Image resize plumbing, Arrow-batched mapInPandas: integer
    stride k = ceil(max(w, h) / max_side), target dims ceil(w/k) ×
    ceil(h/k). A real implementation decodes and area-resamples in
    the same batch loop (the stubbed codec slot, see module
    docstring); the deterministic stand-in strides the payload bytes
    (out = payload[::k], so len(out) = ceil(len/k)) — schema,
    partitioning and batch shape are the real ones, and the output
    arithmetic is closed-form checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            w = b["width"].to_numpy()
            h = b["height"].to_numpy()
            k = np.maximum(1, np.ceil(np.maximum(w, h) / max_side)).astype(int)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": w,
                    "height": h,
                    "target_w": np.ceil(w / k).astype(int),
                    "target_h": np.ceil(h / k).astype(int),
                    "payload": [
                        bytes(bytes(p)[:: int(ki)]) for p, ki in zip(b["payload"], k)
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: explode timestamps to sample at
    (real frame extraction would decode at each ts). Pure Catalyst."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("sample_ts_ms"),
        )
    )
