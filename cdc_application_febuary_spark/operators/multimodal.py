"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition sizing, UDF signature, batch
shape) is real and tested; the actual media decode is STUBBED — the decode
libraries (PIL/ffmpeg/librosa) are not in this container. Each stub either
raises NotImplementedError (real-decode mode) or produces a deterministic
fake (test mode), clearly marked.

Scale design: media bytes stay in executor memory one Arrow batch at a
time (mapInPandas is a streaming iterator — never a full-partition
materialization); metadata-only transforms never touch the bytes column
(column pruning drops it at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png | wav | mp4 | ...
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: content bytes are
    a seeded pattern, so hashes are stable across runs/engines."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                1000 * (i % 7) if kind != "image" else None,
            )
        )
    # createDataFrame splits tiny row sets across defaultParallelism
    # partitions — with mapInPandas downstream that spins up one Python
    # worker per partition for a handful of rows each; coalesce first.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def decode_image(content: bytes) -> "object":
    """STUB — real image decode requires PIL/opencv, not in this container."""
    raise NotImplementedError(
        "image decode stubbed: install PIL/opencv and replace this body"
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Per-media feature extraction over mapInPandas (Arrow batches).

    With ``deterministic_fake`` the 'feature' is byte-length + md5 — enough
    to exercise batch shape, schema and partitioning; flip it off to hit the
    NotImplementedError decode stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not deterministic_fake:
                decode_image(b"")  # raises NotImplementedError
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["content"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature_dim": pdf["content"].map(lambda b: 16),
                }
            )
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — note: never references `content`, so Catalyst
    prunes the binary column out of the scan entirely."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("duration_ms").alias("avg_duration_ms"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode each video into frame
    timestamps (decode stubbed). Produces (media_id, frame_ts_ms) rows —
    the partition-explosion shape a real sampler would feed to a decoder."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
