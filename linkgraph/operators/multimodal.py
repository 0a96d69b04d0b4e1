"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata, processed in
Arrow batches via mapInPandas — the schema, partitioning, UDF
signatures and batch shapes are real and tested.

The codec slot is REAL for header-only formats, in pure numpy (no
codec libraries exist in this container, and none are needed for
these): uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows,
4-byte row padding), binary PPM/PGM (P6/P5, maxval ≤ 255,
whitespace/comment-tolerant headers), and RIFF/WAVE PCM (8/16-bit,
any channel count). ``decode_image_real``/``decode_audio_real``
dispatch on magic bytes and raise ``NotImplementedError`` for
compressed formats (JPEG/PNG/MP3 need external codecs — swapping in
PIL/ffmpeg later changes one dispatch table, not the plan).
``fake_decode`` remains for plumbing tests that want payload-opaque
determinism.
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


import struct

# --- real pure-numpy codecs (header-only formats) --------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BMP (BI_RGB,
    BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded to
    4 bytes — the standard layout)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    data_size = row_bytes * h
    # bottom-up row order, RGB→BGR, per-row zero padding
    rows = pixels[::-1, :, ::-1].astype(np.uint8)
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = rows.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → HxWx3 uint8 RGB. Handles bottom-up
    AND top-down (negative height) row order and 4-byte row padding;
    raises NotImplementedError for compressed/other-depth BMPs."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER (size {hdr_size}) unsupported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, depth = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or depth != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (depth={depth}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * 3 + 3) // 4 * 4
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → binary PPM (P6, maxval 255); HxW → PGM (P5)."""
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic, (h, w) = b"P6", pixels.shape[:2]
    elif pixels.ndim == 2:
        magic, (h, w) = b"P5", pixels.shape
    else:
        raise ValueError(f"expected HxWx3 or HxW array, got shape {pixels.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _ppm_header_ints(payload: bytes, start: int, k: int) -> tuple[list[int], int]:
    """Parse k whitespace/comment-separated ASCII ints from a PNM
    header; returns (values, offset just past the single whitespace
    byte that terminates the last one — where raster data begins)."""
    vals: list[int] = []
    i, n = start, len(payload)
    while len(vals) < k:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PNM header")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8 RGB; PGM (P5) → HxW uint8.
    Whitespace/comment-tolerant header, maxval ≤ 255 only."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload (magic {magic!r})")
    (w, h, maxval), off = _ppm_header_ints(payload, 2, 3)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM unsupported (maxval > 255)")
    ch = 3 if magic == b"P6" else 1
    need = off + w * h * ch
    if len(payload) < need:
        raise ValueError(f"truncated PNM: need {need} bytes, have {len(payload)}")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
    return arr.reshape(h, w, 3).copy() if ch == 3 else arr.reshape(h, w).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) or (n, channels) → RIFF/WAVE PCM 16-bit."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (sample_rate, int16 array (n, channels)).
    Walks the chunk list (fmt may be followed by LIST/fact before
    data); 8-bit PCM is widened to int16 (centered); non-PCM formats
    raise NotImplementedError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = None
    while i + 8 <= n:
        cid, size = struct.unpack_from("<4sI", payload, i)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"only PCM WAV supported (format tag {audio_fmt})"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM unsupported")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            ch, rate, bits = fmt
            if bits == 16:
                arr = np.frombuffer(body, dtype="<i2")
            else:
                arr = np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128
            return rate, arr.reshape(-1, ch).copy()
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def decode_image_real(payload: bytes) -> np.ndarray:
    """The real image-decoder slot: dispatch on magic bytes to the
    pure-numpy codecs above. Compressed formats raise
    NotImplementedError (JPEG/PNG need external codec libraries this
    container doesn't have; a PIL-backed branch slots in here)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "JPEG/PNG decoding requires PIL/libjpeg — not available in this "
            "environment (BMP/PPM/PGM decode natively)"
        )
    raise ValueError(f"unrecognized image payload (magic {payload[:4]!r})")


def decode_audio_real(payload: bytes) -> tuple[int, np.ndarray]:
    """The real audio-decoder slot: RIFF/WAVE PCM natively;
    compressed audio raises NotImplementedError."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        raise NotImplementedError(
            "MP3 decoding requires ffmpeg — not available in this environment "
            "(WAV PCM decodes natively)"
        )
    raise ValueError(f"unrecognized audio payload (magic {payload[:4]!r})")


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in 'decode': fixed-dim float features from
    payload byte statistics. Same signature/shape as a real embedder."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, dim)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(media: DataFrame, dim: int = 8, use_real_decoder: bool = False) -> DataFrame:
    """binary payload → feature vector, Arrow-batched mapInPandas.
    Partition-parallel; one pandas batch per Arrow chunk; no
    per-row Python round trips. With ``use_real_decoder`` the payload
    is actually decoded (BMP/PPM pixels for images, PCM samples for
    audio — ``decode_image_real``/``decode_audio_real``) and the
    feature vector is the chunk-means of the decoded signal; without
    it, ``fake_decode`` computes the same-shaped vector from raw
    payload bytes (payload-opaque plumbing mode)."""

    def chunk_means(arr: np.ndarray, d: int) -> np.ndarray:
        flat = arr.reshape(-1).astype(np.float64)
        chunks = np.array_split(flat, d)
        return np.array(
            [float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for kind, p in zip(b["kind"], b["payload"]):
                raw = bytes(p)
                if not use_real_decoder:
                    feats.append(fake_decode(raw, dim))
                elif kind == "image":
                    feats.append(chunk_means(decode_image_real(raw), dim))
                elif kind == "audio":
                    feats.append(chunk_means(decode_audio_real(raw)[1], dim))
                else:
                    feats.append(fake_decode(raw, dim))
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


# --- contract beds: synthesized real-format payloads whose decoded
# --- statistics are closed-form (DuckDB-replayable without a codec)

IMG_STATS_SCHEMA = (
    "media_id long, width int, height int, n_px long, sum_v long, checksum long"
)
WAV_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, sum_abs long, checksum long"
)


def synth_bmp_media(spark, n: int = 40, partitions: int = 4) -> DataFrame:
    """Deterministic REAL-format image table: media_id → a genuine
    24-bit BMP (encode_bmp: bottom-up rows, BGR, padded) whose pixel
    (y, x, c) value is the closed form
    ``(media_id*7 + x*3 + y*5 + c*11) % 256`` at
    width ``4 + id % 13``, height ``3 + id % 11``. The formula, not
    the bytes, is what the DuckDB oracle replays — so any decoder
    mistake in row order, channel order or padding breaks the
    contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                w, h = 4 + i % 13, 3 + i % 11
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((i * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
                rows.append(
                    {"media_id": i, "kind": "image", "payload": encode_bmp(px)}
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )


def image_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every image payload with the REAL codec path and emit
    order-sensitive statistics: width/height from the decoded array,
    pixel count, plain value sum, and a position-weighted checksum
    ``Σ v(y,x,c)·(y·w + x)·(c+1)`` that any mistake in bottom-up
    unflipping, BGR swap or row padding changes. Arrow-batched
    mapInPandas, one decode per row, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, p in zip(b["media_id"], b["payload"]):
                px = decode_image_real(bytes(p)).astype(np.int64)
                h, w, ch = px.shape
                y, x, c = np.ogrid[0:h, 0:w, 0:ch]
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_px": int(px.size),
                        "sum_v": int(px.sum()),
                        "checksum": int((px * (y * w + x) * (c + 1)).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMG_STATS_SCHEMA)


def synth_wav_media(spark, n: int = 40, partitions: int = 4) -> DataFrame:
    """Deterministic REAL-format audio table: media_id → a genuine
    RIFF/WAVE 16-bit PCM mono payload with sample
    ``s_i = (media_id*13 + i*7) % 4096 - 2048`` over
    ``200 + id % 37`` samples at rate ``8000 + (id % 3)*4000``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                ns = 200 + i % 37
                rate = 8000 + (i % 3) * 4000
                s = ((i * 13 + np.arange(ns) * 7) % 4096 - 2048).astype(np.int16)
                rows.append(
                    {"media_id": i, "kind": "audio", "payload": encode_wav(s, rate)}
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )


def audio_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every audio payload with the REAL WAV-PCM codec and
    emit the parsed sample rate plus order-sensitive sample stats
    (``checksum = Σ s_i·(i+1)`` over interleaved frame order)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, p in zip(b["media_id"], b["payload"]):
                rate, s = decode_audio_real(bytes(p))
                flat = s.reshape(-1).astype(np.int64)
                idx = np.arange(1, len(flat) + 1, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": int(rate),
                        "n_samples": int(len(flat)),
                        "sum_abs": int(np.abs(flat).sum()),
                        "checksum": int((flat * idx).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(run, WAV_STATS_SCHEMA)
