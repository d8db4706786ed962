"""Fixture-table catalog: load the driver's parquet tables as DataFrames.

The reference discovers schemas dynamically from information_schema
(`backend/ingestion/connectors/postgresql.py:232-248` etc.); our analog for
the test fixtures is parquet self-describing schemas plus the one conversion
Spark needs (TIMESTAMP(NANOS) -> TimestampType).

Scale note: `spark.read.parquet` over a directory of files gives splittable,
column-pruned, filter-pushed scans out of the box; nothing here collects to
the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nanosecond timestamps.

    The events table is written as TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    we read the raw int64 nanos and convert with integer division (``div``,
    not ``/`` — epoch-nanos exceed 2^53 so a double round-trip would corrupt).
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with `ts` left as raw int64 epoch-nanos.

    Time-range predicates belong on this raw column: an integer comparison
    pushes down to parquet row-group statistics and prunes I/O, while a
    predicate on the *converted* timestamp (`timestamp_micros(ts div 1000)`)
    cannot. Filter raw, then convert with `events_ts()`."""
    tune(spark)
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")


def events_ts(df: DataFrame) -> DataFrame:
    """Convert a raw-nanos events frame to the canonical timestamp shape."""
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ts_nanos(iso_ts: str) -> int:
    """Epoch-nanos bound for a naive-UTC ISO timestamp — whole-second
    boundaries convert exactly, so raw-nanos comparison is equivalent to
    the timestamp comparison."""
    import datetime as _dt

    dt = _dt.datetime.fromisoformat(iso_ts).replace(tzinfo=_dt.timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql access."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
