"""Streaming monitoring: the reference's metrics collector + lag health
monitor (`metrics_collector.py:29-169`, `cdc_health_monitor.py:24-197`,
`monitoring.py:41-134`) re-expressed as a StreamingQueryListener plus
DataFrame aggregations over the metrics it emits.

Thresholds are the reference's: lag normal <60s, warning <300s, critical
>=300s (lag_monitor.py:83); slot-bytes warning 100KB / critical 500KB /
stuck 1MB (cdc_health_monitor.py:24-27).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQueryListener

LAG_WARNING_SEC = 60
LAG_CRITICAL_SEC = 300
SLOT_WARNING_BYTES = 100 * 1024
SLOT_CRITICAL_BYTES = 500 * 1024
SLOT_STUCK_BYTES = 1024 * 1024


class MetricsListener(StreamingQueryListener):
    """Collects per-progress metrics rows:
    (query_name, batch_id, ts, input_rows, rows_per_sec, batch_duration_ms).
    Buffered driver-side (tiny — one row per micro-batch) and flushed to a
    parquet metrics table on demand."""

    def __init__(self) -> None:
        self._rows: list[tuple] = []
        self._lock = threading.Lock()

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass  # start/stop carry no metrics; progress is the only signal used

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            self._rows.append(
                (
                    p.name or p.id.__str__(),
                    int(p.batchId),
                    p.timestamp,
                    int(p.numInputRows),
                    float(p.processedRowsPerSecond or 0.0),
                    int(p.batchDuration),
                )
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass  # intentional no-op: terminal state is read from the query handle

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass  # intentional no-op: idle ticks add no rows to the metrics table

    # -- consumption --------------------------------------------------------
    def snapshot(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self._rows)
        return spark.createDataFrame(
            rows,
            "query_name string, batch_id long, ts string, input_rows long, "
            "rows_per_sec double, batch_duration_ms long",
        )

    def flush_to(self, spark: SparkSession, path: str) -> None:
        self.snapshot(spark).write.mode("append").parquet(path)


def throughput_summary(metrics: DataFrame) -> DataFrame:
    """Per-query totals (reference pipeline_metrics rollup, A12-shaped)."""
    return (
        metrics.groupBy("query_name")
        .agg(
            F.sum("input_rows").alias("total_rows"),
            F.round(F.avg("rows_per_sec"), 2).alias("avg_rows_per_sec"),
            F.max("batch_id").alias("last_batch_id"),
            F.sum("batch_duration_ms").alias("total_batch_ms"),
        )
        .orderBy("query_name")
    )


def lag_health(lag_seconds) -> "F.Column":
    """Reference threshold classification (lag_monitor.py:83)."""
    c = F.col(lag_seconds) if isinstance(lag_seconds, str) else lag_seconds
    return (
        F.when(c < LAG_WARNING_SEC, F.lit("normal"))
        .when(c < LAG_CRITICAL_SEC, F.lit("warning"))
        .otherwise(F.lit("critical"))
    )


def slot_health(gap_bytes) -> "F.Column":
    """Reference slot-byte thresholds (cdc_health_monitor.py:24-27)."""
    c = F.col(gap_bytes) if isinstance(gap_bytes, str) else gap_bytes
    return (
        F.when(c >= SLOT_STUCK_BYTES, F.lit("stuck"))
        .when(c >= SLOT_CRITICAL_BYTES, F.lit("critical"))
        .when(c >= SLOT_WARNING_BYTES, F.lit("warning"))
        .otherwise(F.lit("normal"))
    )


def event_log_dashboard(event_log: DataFrame, days: int = 7) -> DataFrame:
    """The monitoring-dashboard aggregate (reference api.py:7716-7994) over
    the streamed event log: per-pipeline totals by normalized type within
    the window. Partition pruning on event_date bounds the scan."""
    cutoff = F.date_sub(F.current_date(), days)
    return (
        event_log.where(F.col("event_date") >= cutoff)
        .groupBy("pipeline_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("pipeline_id", "event_type")
    )
