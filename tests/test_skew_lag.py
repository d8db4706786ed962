"""Skew-handling joins/aggregations and consumer-lag accounting."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.skew import (
    salted_join,
    skew_report,
    two_phase_count,
)
from cdc_application_febuary_spark.streaming.changelog_stream import topic_pattern
from cdc_application_febuary_spark.streaming.lag import (
    group_lag,
    pipeline_lag_status,
)


def _skewed(spark):
    # key 1 is hot (1000 rows), keys 2..10 have one row each
    hot = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(2, 11).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b")], ["k", "name"]
    )
    plain = large.join(small, ["k"]).groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        salted_join(large, small, ["k"], salts=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted((r["k"], r["n"]) for r in plain.collect()) == sorted(
        (r["k"], r["n"]) for r in salted.collect()
    )


def test_salted_join_spreads_hot_key(spark):
    from cdc_application_febuary_spark.operators.skew import salt_large_side

    salts = salt_large_side(_skewed(spark).where("k = 1"), 8)
    used = salts.select("__salt").distinct().count()
    assert used >= 6  # the hot key scatters across most salt buckets


def test_salted_join_bounds_max_task_input(spark):
    """The 100x claim, closed: under a hot key that owns ~99% of the rows,
    the salted join's shuffle partitions each receive a bounded slice of the
    hot key instead of all of it.  Join tasks hash-partition on
    (k, __salt), so the per-(k, __salt) group size IS the per-task input for
    that key — assert it stays within 2x the ideal hot/salts split, and that
    the physical plan really shuffles on the salted key (no broadcast
    short-circuit hiding the claim)."""
    from cdc_application_febuary_spark.operators.skew import (
        explode_small_side,
        salt_large_side,
    )

    salts = 16
    hot_n = 20_000
    hot = spark.range(hot_n).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(2, 102).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    large = hot.unionByName(cold)
    small = spark.range(1, 102).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )

    # per-task input bound: every (k, salt) slice of the hot key is ~hot/salts
    slices = (
        salt_large_side(large, salts)
        .where("k = 1")
        .groupBy("__salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(slices) == salts  # every salt bucket is used at this volume
    assert max(r["n"] for r in slices) <= 2 * hot_n / salts
    # an unsalted join would put all hot_n rows in ONE task's input

    # plan: the shuffle key includes the salt, so the bound above is the
    # real per-task bound (force a shuffle join; broadcast would dodge it)
    with_salt = salt_large_side(large, salts).join(
        explode_small_side(small, salts).hint("shuffle_hash"),
        ["k", "__salt"],
    )
    plan = with_salt._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan and "hashpartitioning(k" in plan
    # and correctness is preserved end-to-end
    assert salted_join(large, small, ["k"], salts=salts).count() == hot_n + 100


def test_two_phase_count(spark):
    out = {r["k"]: r["cnt"] for r in two_phase_count(_skewed(spark), ["k"]).collect()}
    assert out[1] == 1000 and out[5] == 1


def test_skew_report(spark):
    top = skew_report(_skewed(spark), ["k"], top=3).collect()
    assert top[0]["k"] == 1 and top[0]["cnt"] == 1000
    assert abs(top[0]["share"] - 1000 / 1009) < 1e-4


def _offsets(spark):
    rows = [
        ("cdc-p1", "p1.public.orders", 0, 100, 150),
        ("cdc-p1", "p1.public.orders", 1, 200, 200),
        ("cdc-p1", "p1.public.items", 0, 50, 70),
        ("cdc-p2", "p2.dbo.x", 0, 10, 10),
        ("cdc-p2", "p2.dbo.x", 1, 900, 800),  # committed past end -> 0
    ]
    return spark.createDataFrame(
        rows,
        "group_id string, topic string, partition int, "
        "committed_offset long, end_offset long",
    )


def test_group_lag(spark):
    got = {r["group_id"]: (r["total_lag"], r["max_partition_lag"])
           for r in group_lag(_offsets(spark)).collect()}
    assert got["cdc-p1"] == (70, 50)
    assert got["cdc-p2"] == (0, 0)  # negative lag floors to zero


def test_group_lag_topic_filter(spark):
    got = group_lag(_offsets(spark), topic_filter=r"^p1\.public\.orders$").collect()
    assert len(got) == 1 and got[0]["total_lag"] == 50


def test_pipeline_lag_status_health(spark):
    out = {r["group_id"]: r["health"]
           for r in pipeline_lag_status(_offsets(spark), events_per_sec=1.0).collect()}
    assert out["cdc-p1"] == "warning"  # 70s at 1 ev/s
    assert out["cdc-p2"] == "normal"


def test_topic_pattern(spark):
    import re

    pg = topic_pattern("p1")
    assert re.match(pg, "p1.public.orders")
    assert not re.match(pg, "p1.db.public.orders")
    assert not re.match(pg, "p2.public.orders")
    mssql = topic_pattern("p1", "sqlserver")
    assert re.match(mssql, "p1.mydb.dbo.orders")
    assert not re.match(mssql, "p1.dbo.orders")


def test_two_phase_distinct_count_parity(spark):
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.operators.skew import (
        two_phase_distinct_count,
    )

    # zipf-ish: key 0 holds most rows, with duplicated values
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    got = {
        r["k"]: r["distinct_cnt"]
        for r in two_phase_distinct_count(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    assert got == want
