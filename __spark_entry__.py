"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``cdc_application_febuary_spark/``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the complete
    training-data pipeline as one checkable funnel — quality -> Gopher
    repetition gate -> language -> exact dedup -> near-dup cluster
    keep-one -> benchmark decontamination -> token-budget packing,
    reported as per-stage surviving docs + token budget + packed bins."""
    from cdc_application_febuary_spark.queries import pipeline_ops

    return pipeline_ops.corpus_prep_funnel_v3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cdc_application_febuary_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for genuinely
    non-SQL-expressible ops, which get the weaker rows-only check)."""
    from cdc_application_febuary_spark.queries import all_oracles

    return all_oracles()
