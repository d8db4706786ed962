"""SCD2 target compaction: an append-only change log grows forever; the
maintenance job periodically rewrites it as (current snapshot) + (empty
tail), bounding read amplification for current-state queries while a
separate archive keeps full history.

Compaction is itself just the current-state plan + a partitioned write —
one shuffle on the business key; at scale you run it per date-partition
range so each run touches a bounded slice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F

from .scd2 import current_state


@dataclass
class CompactionStats:
    rows_before: int
    rows_after: int
    deleted_keys_dropped: int


def compact_scd2_target(
    spark: SparkSession,
    target_path: str,
    compacted_path: str,
    key_cols: list[str],
    order_cols: list[str] = ("__source_ts_ms",),
    archive_path: str | None = None,
) -> CompactionStats:
    """Rewrite an SCD2 append log as its current snapshot.

    * live keys keep exactly their latest version (still `__op`-stamped, so
      the compacted table remains a valid SCD2 log to append onto);
    * keys whose latest version is a rewritten delete are dropped from the
      snapshot (their history survives only in the archive);
    * with ``archive_path`` the full pre-compaction log is preserved first.
    """
    log = spark.read.parquet(target_path)
    rows_before = log.count()
    if archive_path:
        log.write.mode("append").parquet(archive_path)

    # ONE current-state pass (keep_deleted=True), split live vs deleted from
    # it: a second window over the full log would be an extra full shuffle,
    # and with tied order_cols its row_number could pick a different survivor
    # than the snapshot actually written, skewing deleted_keys_dropped.
    latest = current_state(
        log, key_cols, list(order_cols), keep_deleted=True
    ).persist()
    try:
        snapshot = latest.where(~F.col("__deleted").eqNullSafe("true"))
        snapshot.write.mode("overwrite").parquet(compacted_path)
        rows_after = spark.read.parquet(compacted_path).count()
        deleted_dropped = latest.count() - rows_after
    finally:
        latest.unpersist()
    return CompactionStats(
        rows_before=rows_before,
        rows_after=rows_after,
        deleted_keys_dropped=deleted_dropped,
    )
