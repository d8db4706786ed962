"""Consumer-lag accounting (reference A12,
`backend/ingestion/monitoring.py:41-134`): per consumer group, lag =
sum over topic-partitions of (end_offset - committed_offset), filtered to
the pipeline's topics; plus per-pipeline health classification.

The offsets snapshot arrives as a DataFrame (from Kafka AdminClient in the
driver, or the streaming progress log) with columns
``(group_id, topic, partition, committed_offset, end_offset)`` — matching
the reference's `lag_report.json` shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .monitoring import lag_health


def partition_lag(offsets: DataFrame) -> DataFrame:
    """Per topic-partition lag, floored at 0 (a committed offset past the
    cached end offset reads as 0, matching the reference)."""
    return offsets.withColumn(
        "lag",
        F.greatest(
            F.col("end_offset") - F.col("committed_offset"), F.lit(0).cast("long")
        ),
    )


def group_lag(offsets: DataFrame, topic_filter: str | None = None) -> DataFrame:
    """Per consumer group: total lag, partition count, max single-partition
    lag (reference monitoring.py:90-124)."""
    df = partition_lag(offsets)
    if topic_filter:
        df = df.where(F.col("topic").rlike(topic_filter))
    return (
        df.groupBy("group_id")
        .agg(
            F.sum("lag").alias("total_lag"),
            F.count(F.lit(1)).alias("partitions"),
            F.max("lag").alias("max_partition_lag"),
        )
        .orderBy("group_id")
    )


def pipeline_lag_status(
    offsets: DataFrame, events_per_sec: float = 100.0
) -> DataFrame:
    """Group lag -> estimated seconds of lag (at an assumed drain rate) ->
    health bucket using the reference thresholds."""
    g = group_lag(offsets)
    secs = F.col("total_lag") / F.lit(float(events_per_sec))
    return g.select(
        "group_id",
        "total_lag",
        F.round(secs, 2).alias("est_lag_sec"),
        lag_health(secs).alias("health"),
    )
