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
    """Events with `ts` normalized to raw int64 epoch-nanos.

    Two fixture generations exist: TIMESTAMP(NANOS) parquet (read as bigint
    via the nanosAsLong conf — already epoch-nanos) and TIMESTAMP(MICROS)
    parquet (read as TimestampType — converted here with ``unix_micros * 1000``,
    exact because the source precision is micros). Integer-nanos is the
    engine's exchange representation for as-of joins, session gaps, and the
    DuckDB ``epoch_ns`` oracles. For time-RANGE pruning prefer
    ``push_ts_filter`` which predicates the *native* column so parquet
    row-group stats apply."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    if dict(df.dtypes).get("ts") != "bigint":
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def push_ts_filter(spark: SparkSession, sf_dir: str, lo_iso: str) -> DataFrame:
    """Events with ``ts >= lo_iso`` applied on the NATIVE column type, then
    normalized to epoch-nanos. Predicating before any conversion keeps the
    comparison on the stored column so it reaches parquet row-group statistics
    (bigint-nanos fixtures compare against the integer bound; timestamp
    fixtures against a timestamp literal — both prune I/O)."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.where(F.col("ts") >= F.lit(ts_nanos(lo_iso)))
    else:
        df = df.where(
            F.col("ts") >= F.lit(lo_iso).cast(dict(df.dtypes)["ts"])
        ).withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


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
