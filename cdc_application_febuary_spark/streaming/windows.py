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


def session_windowed_counts(
    stream: DataFrame,
    ts_col: str = "source_ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key session windows (dynamic-length, gap-merged) with
    watermarked event time — the streaming twin of the batch
    ``user_session_windows`` query. A session emits once the watermark
    passes its end (last event + gap), so output is append-mode safe."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
        )
    )
