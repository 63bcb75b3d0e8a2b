"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The Spark-side machinery here is real and tested — schemas, batch
iteration, partition sizing, metadata propagation. The actual media
decoding is STUBBED behind ``decoder=`` hooks (the container has no
image/audio libraries): the default decoder is a deterministic fake
that derives pseudo-features from the bytes, and ``strict_decoder``
raises NotImplementedError to mark the integration point for a real
PIL/ffmpeg-backed implementation.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def fake_decode(payload: bytes, n_features: int = 16) -> np.ndarray:
    """Deterministic fake feature extractor: sha256-seeded pseudo
    features. Stands in for image-decode + model-embed."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_features).astype(np.float32)


def strict_decoder(payload: bytes, n_features: int = 16) -> np.ndarray:
    """Integration point for a real decoder (PIL/torchaudio/ffmpeg)."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this environment; plug a real decoder into extract_features()"
    )


# -- real bytes-level header parsing (no media libraries needed) -------------
#
# Full pixel/sample decode needs codecs the container lacks, but the
# container FORMATS are plain byte layouts: PNG's IHDR chunk and WAV's
# RIFF/fmt chunk carry dimensions / sample rate at fixed offsets. Two
# implementations of the same parse:
#   * JVM-side: pure SQL expressions (substring + conv(hex)) — the scale
#     path, whole-stage codegen'd, for metadata validation over billions
#     of blobs without a Python boundary;
#   * Python (png_header_decoder): a real decoder= hook for the
#     mapInPandas feature path, deterministic features from the header.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _be(payload_col, pos: int, nbytes: int):
    """Big-endian unsigned int from ``nbytes`` bytes at 1-based ``pos``
    of a binary column — conv(hex(substring)) keeps it JVM-side."""
    return F.conv(F.hex(F.substring(payload_col, pos, nbytes)), 16, 10).cast(
        "bigint"
    )


def _le(payload_col, pos: int, nbytes: int):
    """Little-endian unsigned int, one term per byte (binary has no
    reverse(); nbytes ≤ 4 keeps the expression small)."""
    out = F.lit(0).cast("bigint")
    for i in range(nbytes):
        out = out + _be(payload_col, pos + i, 1) * F.lit(1 << (8 * i)).cast("bigint")
    return out


def png_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse the PNG signature + IHDR chunk with pure expressions:
    adds png_ok, png_width, png_height, png_bit_depth, png_color_type
    (nulls when the blob isn't a PNG). Layout per the PNG spec: 8-byte
    signature, 4-byte IHDR length, 'IHDR', then width/height as 4-byte
    big-endian at offsets 16/20 (0-based)."""
    p = F.col(payload_col)
    is_png = (F.length(p) >= 26) & (
        F.hex(F.substring(p, 1, 8)) == _PNG_SIG.hex().upper()
    ) & (F.substring(p, 13, 4).cast("string") == "IHDR")
    return (
        df.withColumn("png_ok", is_png)
        .withColumn("png_width", F.when(is_png, _be(p, 17, 4)).cast("int"))
        .withColumn("png_height", F.when(is_png, _be(p, 21, 4)).cast("int"))
        .withColumn("png_bit_depth", F.when(is_png, _be(p, 25, 1)).cast("int"))
        .withColumn("png_color_type", F.when(is_png, _be(p, 26, 1)).cast("int"))
    )


def wav_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse the RIFF/WAVE header with pure expressions: adds wav_ok,
    wav_channels, wav_sample_rate, wav_bits_per_sample (nulls when not
    a canonical WAV). Assumes the canonical layout with 'fmt ' as the
    first chunk at offset 12 (0-based) — true for the overwhelming
    majority of real WAV files; others fall out as wav_ok = false."""
    p = F.col(payload_col)
    is_wav = (F.length(p) >= 36) & (
        F.substring(p, 1, 4).cast("string") == "RIFF"
    ) & (F.substring(p, 9, 4).cast("string") == "WAVE") & (
        F.substring(p, 13, 4).cast("string") == "fmt "
    )
    return (
        df.withColumn("wav_ok", is_wav)
        .withColumn("wav_channels", F.when(is_wav, _le(p, 23, 2)).cast("int"))
        .withColumn("wav_sample_rate", F.when(is_wav, _le(p, 25, 4)).cast("int"))
        .withColumn(
            "wav_bits_per_sample", F.when(is_wav, _le(p, 35, 2)).cast("int")
        )
    )


def png_header_decoder(payload: bytes, n_features: int = 16) -> np.ndarray:
    """A REAL (non-synthetic) decoder= hook for extract_features():
    parses the PNG header byte-level and emits deterministic features
    [width, height, bit_depth, color_type, log-size, 0-padding].
    Raises ValueError on non-PNG input (strict, like a codec would)."""
    if payload is None or len(payload) < 26 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    bit_depth = payload[24]
    color_type = payload[25]
    feats = np.zeros(n_features, dtype=np.float32)
    vals = [width, height, bit_depth, color_type, np.log1p(len(payload))]
    feats[: len(vals)] = vals
    return feats


def synthetic_png(width: int, height: int, bit_depth: int = 8,
                  color_type: int = 6) -> bytes:
    """Minimal structurally-valid PNG prefix (signature + IHDR) for
    tests — a real PNG's first 26 bytes follow exactly this layout."""
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, 0])
    )
    return _PNG_SIG + (13).to_bytes(4, "big") + b"IHDR" + ihdr


def synthetic_wav(channels: int, sample_rate: int,
                  bits_per_sample: int = 16, n_frames: int = 0) -> bytes:
    """Minimal canonical WAV header (RIFF + fmt + empty data chunk)."""
    block_align = channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_frames * block_align)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits_per_sample.to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def extract_features(
    df: DataFrame,
    decoder: Optional[Callable[[bytes], np.ndarray]] = None,
    n_features: int = 16,
    batch_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction: binary in, float features out.
    Arrow moves payload batches to Python once; the decode loop is
    per-media-object (inherently so — media decode isn't columnar)."""
    dec = decoder or (lambda b: fake_decode(b, n_features))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(bytes(b) if b is not None else b"") for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].apply(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha": pdf["payload"].apply(
                        lambda b: hashlib.sha256(bytes(b) if b else b"").hexdigest()
                    ),
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_plan(
    df: DataFrame,
    max_side: int = 256,
    payload_col: str = "payload",
) -> DataFrame:
    """Aspect-preserving resize TARGETS computed from the parsed PNG
    header as pure expressions (no decode needed to plan a resize):
    adds resize_w / resize_h / resize_scale, null for non-PNG payloads.
    The actual pixel resample is the decode stub's job — the planning
    math (what a distributed preprocessing job shuffles/batches on) is
    real and tested."""
    out = png_metadata(df, payload_col)
    w, h = F.col("png_width").cast("double"), F.col("png_height").cast("double")
    scale = F.least(
        F.lit(float(max_side)) / F.greatest(w, h), F.lit(1.0)
    )
    return (
        out.withColumn("resize_scale", F.when(F.col("png_ok"), scale))
        .withColumn(
            "resize_w",
            F.when(F.col("png_ok"), F.greatest(F.round(w * scale), F.lit(1.0)))
            .cast("int"),
        )
        .withColumn(
            "resize_h",
            F.when(F.col("png_ok"), F.greatest(F.round(h * scale), F.lit(1.0)))
            .cast("int"),
        )
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    frame_decoder: Optional[Callable[[bytes, int], bytes]] = None,
) -> DataFrame:
    """Video frame sampling through mapInPandas — the ONE-ROW-IN,
    MANY-ROWS-OUT Arrow shape (vs extract_features' 1:1): each video row
    fans out to one row per sampled timestamp at ``every_ms`` intervals
    across duration_ms, capped at ``max_frames``. The real decoder hook
    (``frame_decoder(payload, ts_ms) -> frame bytes``) is where ffmpeg
    plugs in; the default is a deterministic fake that slices the
    payload, keeping the schema/batching/fan-out plumbing real."""

    def fake_frame(payload: bytes, ts_ms: int) -> bytes:
        if not payload:
            return b""
        start = ts_ms % max(len(payload), 1)
        return payload[start:start + 16]

    dec = frame_decoder or fake_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                # nullable int arrives in pandas as float NaN (truthy!)
                # — `or 0` doesn't guard it and int(NaN) raises
                dur = 0 if pd.isna(row["duration_ms"]) else int(row["duration_ms"])
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                n = min(max(dur // every_ms, 0) + 1, max_frames)
                for i in range(n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(dec(payload, i * every_ms))
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_idx": np.array(idxs, dtype=np.int32),
                        "ts_ms": np.array(tss, dtype=np.int32),
                        "frame_bytes": frames,
                    }
                )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with the MEDIA_SCHEMA shape."""
    df = spark.range(n)
    payload = F.encode(
        F.concat(F.lit("media-payload-"), F.sha2(F.concat(F.lit(seed), F.col("id")), 256)),
        "utf-8",
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    return df.select(
        F.format_string("m-%08d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.col("id"), 10000)).cast("int").alias("duration_ms"),
    )
