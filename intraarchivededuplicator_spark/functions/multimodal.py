"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's media kernel is pHash over decoded images
(/root/reference/scanner/hashFile.py:95-106) with a mime dispatcher
(/root/reference/scanner/fileHasher.py:406-455). At 100 TB the pattern is:
media as opaque `binary` columns with typed metadata, decode / feature /
resize / frame-sample as Arrow-batched `mapInPandas` stages so each executor
processes whole record batches without per-row Python.

This container has no image/audio codecs, so the *decode* kernel is stubbed:
`decode_backend="real"` raises NotImplementedError at the exact call site a
codec (PIL / torchaudio / pyav) would plug into, and the default
`decode_backend="fake"` derives deterministic dimensions / frames / features
from the payload bytes (blake2b) so the Spark-side plumbing — schema, batch
shape, partitioning, downstream joins — is real and fully tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 64


def _fake_decode_batch(payloads: pd.Series, media_types: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a codec: dims/frames/features from bytes."""
    n = len(payloads)
    width = np.zeros(n, dtype=np.int32)
    height = np.zeros(n, dtype=np.int32)
    frames = np.ones(n, dtype=np.int32)
    feats: list[list[float] | None] = []
    for i, (raw, mt) in enumerate(zip(payloads, media_types)):
        if raw is None:
            feats.append(None)
            continue
        d = hashlib.blake2b(bytes(raw), digest_size=8).digest()
        df_ = hashlib.blake2b(
            bytes(raw), digest_size=FEATURE_DIM, person=b"feat"
        ).digest()
        width[i] = 16 + d[0] * 4
        height[i] = 16 + d[1] * 4
        frames[i] = 1 if mt == "image" else 1 + int.from_bytes(d[2:4], "big") % 300
        v = np.frombuffer(df_, dtype=np.uint8).astype(np.float32)
        v = (v - 127.5) / 127.5
        v /= np.linalg.norm(v) or 1.0
        feats.append([float(x) for x in v])
    return pd.DataFrame(
        {
            "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype(
                "int32"
            ),
            "width": width,
            "height": height,
            "n_frames": frames,
            "features": feats,
        }
    )


def _real_decode_batch(payloads: pd.Series, media_types: pd.Series) -> pd.DataFrame:
    raise NotImplementedError(
        "real codecs (PIL/pyav/torchaudio) are not available in this "
        "environment; plug the decoder in here — the Spark plumbing around it "
        "is unchanged"
    )


def decode_media(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """media(MEDIA_SCHEMA) -> DECODED_SCHEMA via Arrow-batched mapInPandas.

    mapInPandas (not a scalar UDF) because decode is multi-column-in,
    multi-column-out and benefits from whole-batch vectorization — the H4
    dispatcher shape (/root/reference/scanner/hashFile.py:135-164).
    """
    decode = _fake_decode_batch if decode_backend == "fake" else _real_decode_batch

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode(pdf["payload"], pdf["media_type"])
            yield pd.concat(
                [pdf[["media_id", "url", "media_type"]].reset_index(drop=True), out],
                axis=1,
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 30, max_frames: int = 16) -> DataFrame:
    """Explode sampled frame indices per video row — pure column ops (JVM-side)."""
    idx = F.slice(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)), 1, max_frames
    )
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(idx))
        .select("media_id", "url", "frame_idx")
    )


def media_near_dup_pairs(
    decoded: DataFrame, hamming_radius: int = 8, n_bands: int = 16
) -> DataFrame:
    """Near-dup media via hyperplane LSH over decoded features — the pHash
    radius-match analog (/root/reference/dbPhashApi.py:175-192) for media."""
    from ..operators.ann import make_hyperplane_udf
    from ..operators.banded_join import banded_self_join

    sig_udf = make_hyperplane_udf(FEATURE_DIM)
    sigged = decoded.filter(F.col("features").isNotNull()).select(
        F.col("media_id"),
        sig_udf(F.col("features").cast("array<double>")).alias("sig"),
    )
    return banded_self_join(sigged, "media_id", "sig", hamming_radius, n_bands=n_bands)
