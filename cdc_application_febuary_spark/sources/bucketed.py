"""Bucketed-table layout: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark's
answer is BUCKETING (hash-partitioned file layout recorded in the
catalog): write both tables bucketed by the join key with the SAME bucket
count, and the sort-merge join reads bucket i of each side on one
executor — zero Exchange in the plan, every run, forever. This module
wraps the `bucketBy` writer with the conventions that make the
elimination actually fire:

* equal ``n_buckets`` on both sides (mismatch silently reshuffles one);
* ``sortBy`` the join key inside buckets so the merge needs no sort;
* one file per bucket (repartition first) — the classic small-files trap
  with bucketed writes is one file per task per bucket.

The same layout serves keyed AGGREGATIONS (groupBy the bucket key needs
no exchange) and repeated joins against any co-bucketed table — the
mechanism behind "pre-shuffle once, join free for the life of the data".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and in-bucket sorted)
    by ``bucket_cols``. Repartitions by the bucket key first so each
    bucket lands as one file per bucket, not one per upstream task."""
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan — the
    thing bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
