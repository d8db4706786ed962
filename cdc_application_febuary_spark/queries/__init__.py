"""Query registry: declared correctness queries (SURVEY.md §2.11) plus the
beyond-reference data-pipeline queries, each paired with a DuckDB oracle."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from . import declared, pipeline_ops, tpch_style

    out: dict[str, QueryFn] = {}
    out.update(declared.QUERIES)
    out.update(pipeline_ops.QUERIES)
    out.update(tpch_style.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import declared, pipeline_ops, tpch_style

    out: dict[str, str] = {}
    out.update(declared.ORACLES)
    out.update(pipeline_ops.ORACLES)
    out.update(tpch_style.ORACLES)
    return out
