"""Query registry: declared correctness queries (SURVEY.md §2.11) plus the
beyond-reference data-pipeline queries, each paired with a DuckDB oracle."""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _hash_stable(fn: QueryFn) -> QueryFn:
    """Cast any DecimalType output column to DOUBLE.

    Driver-visible results must not carry DECIMAL columns: the round-1 driver
    hashed Spark's Decimal objects against the oracle's float64 values, so any
    value with trailing zeros at the decimal's scale ("123.40" vs "123.4")
    hash-mismatched despite identical values (VERDICT r1: q10, profile_orders,
    asof_attribution). Internal aggregation stays exact decimal (the builders
    cast inputs to DECIMAL before SUM, keeping order-independence); only the
    final projection converts — decimal->double is correctly rounded and
    identical in Spark and DuckDB, so both sides hash the same float64.
    Applied after orderBy/limit, so ordering still uses exact decimals.
    """

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import DecimalType

        df = fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, DecimalType):
                df = df.withColumn(field.name, F.col(field.name).cast("double"))
        return df

    return wrapped


def all_queries() -> dict[str, QueryFn]:
    from . import declared, pipeline_ops, tpch_style

    out: dict[str, QueryFn] = {}
    out.update(declared.QUERIES)
    out.update(pipeline_ops.QUERIES)
    out.update(tpch_style.QUERIES)
    return {name: _hash_stable(fn) for name, fn in out.items()}


def all_oracles() -> dict[str, str]:
    from . import declared, pipeline_ops, tpch_style

    out: dict[str, str] = {}
    out.update(declared.ORACLES)
    out.update(pipeline_ops.ORACLES)
    out.update(tpch_style.ORACLES)
    return out
