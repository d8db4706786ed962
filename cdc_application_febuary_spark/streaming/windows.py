"""Streaming windowed aggregation with late-data policy.

The reference computes daily/hourly buckets only after events land (T7) and
has NO watermark/late-data policy (T6) — the engine adds one: tumbling
windows with a configurable watermark; rows later than the watermark are
dropped from their (already emitted) window instead of silently mutating
history."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "source_ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling per-key counts with watermarked event time. In append mode a
    window emits once its watermark passes — the streaming twin of the
    batch A13/A14 bucket queries."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "cnt",
        )
    )
