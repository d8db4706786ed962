"""Bucketed layout eliminates the join/agg shuffle — plan-asserted."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import bucketed as B


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_has_zero_exchanges(spark, tmp_path, no_broadcast):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("w")
    )
    B.write_bucketed_table(left, "bj_left", ["k"], n_buckets=8)
    B.write_bucketed_table(right, "bj_right", ["k"], n_buckets=8)
    try:
        joined = B.read_bucketed(spark, "bj_left").join(
            B.read_bucketed(spark, "bj_right"), "k"
        )
        assert B.exchanges_in_plan(joined) == 0  # co-located: no shuffle
        assert joined.count() == 5000

        # the identical join over plain (unbucketed) parquet shuffles both
        left.write.mode("overwrite").parquet(str(tmp_path / "pl"))
        right.write.mode("overwrite").parquet(str(tmp_path / "pr"))
        plain = spark.read.parquet(str(tmp_path / "pl")).join(
            spark.read.parquet(str(tmp_path / "pr")), "k"
        )
        assert B.exchanges_in_plan(plain) >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")


def test_bucketed_groupby_has_zero_exchanges(spark, no_broadcast):
    df = spark.range(0, 4000).select(
        (F.col("id") % 512).alias("k"), F.col("id").alias("v")
    )
    B.write_bucketed_table(df, "bg_t", ["k"], n_buckets=8)
    try:
        agg = (
            B.read_bucketed(spark, "bg_t")
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
        )
        assert B.exchanges_in_plan(agg) == 0
        assert agg.count() == 512
    finally:
        spark.sql("DROP TABLE IF EXISTS bg_t")


def test_mismatched_bucket_counts_still_correct(spark, no_broadcast):
    """8-vs-4 buckets: Spark may coalesce or reshuffle — correctness never
    depends on the layout, only the exchange count does."""
    left = spark.range(0, 1000).select(F.col("id").alias("k"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    B.write_bucketed_table(left, "bm_l", ["k"], n_buckets=8)
    B.write_bucketed_table(right, "bm_r", ["k"], n_buckets=4)
    try:
        joined = B.read_bucketed(spark, "bm_l").join(
            B.read_bucketed(spark, "bm_r"), "k"
        )
        assert joined.count() == 1000
        # at most one side reshuffles; never both
        assert B.exchanges_in_plan(joined) <= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bm_l")
        spark.sql("DROP TABLE IF EXISTS bm_r")


def test_one_file_per_bucket(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    B.write_bucketed_table(df, "bf_t", ["k"], n_buckets=8)
    try:
        files = spark.table("bf_t").inputFiles()
        assert len(files) == 8  # repartition-first avoids file explosion
    finally:
        spark.sql("DROP TABLE IF EXISTS bf_t")
