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
