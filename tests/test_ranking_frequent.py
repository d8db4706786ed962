"""Scalable ranking (partition-offset row_number / NTILE) and exact
distributed heavy hitters."""

import random

import pytest

from pyspark.sql import Window, functions as F

from cdc_application_febuary_spark.operators import frequent, ranking


# --- ranking ---------------------------------------------------------------

def _rand_df(spark, n, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 50), rng.random()) for i in range(n)]
    return spark.createDataFrame(rows, "id long, k long, x double")


def test_global_rank_matches_single_partition_window(spark):
    df = _rand_df(spark, 500, 1)
    order = [F.desc("k"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in ranking.with_global_rank(df, order, "rank").collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,q", [(500, 5), (7, 10), (100, 7), (32, 32)])
def test_scalable_ntile_matches_ansi_ntile(spark, n, q):
    df = _rand_df(spark, n, seed=n * 31 + q)
    order = [F.asc("x"), F.asc("id")]
    got = {
        r["id"]: r["t"]
        for r in ranking.scalable_ntile(df, q, order, "t").collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(q).over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want


def test_scalable_ntile_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        ranking.scalable_ntile(_rand_df(spark, 5, 0), 0, ["id"])


# --- heavy hitters ---------------------------------------------------------

def _skewed_df(spark, seed=7):
    """~Zipfian: a few hot values, a long uniform tail, some NULLs."""
    rng = random.Random(seed)
    vals = []
    vals += ["hot_a"] * 900 + ["hot_b"] * 500 + ["warm"] * 120
    vals += [f"tail_{rng.randint(0, 2000)}" for _ in range(2480)]
    vals += [None] * 100
    rng.shuffle(vals)
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_heavy_hitters_equal_group_by_having(spark):
    df = _skewed_df(spark)
    k = 20  # threshold: > N/k = 4000/20 = 200 non-null rows
    got = [
        (r["value"], r["cnt"]) for r in frequent.heavy_hitters(df, "v", k).collect()
    ]
    n = df.where(F.col("v").isNotNull()).count()
    want = [
        (r["v"], r["cnt"])
        for r in df.where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .orderBy(F.desc("cnt"), "v")
        .collect()
    ]
    assert got == want == [("hot_a", 900), ("hot_b", 500)]


def test_candidates_are_superset_of_heavy_hitters(spark):
    df = _skewed_df(spark, seed=11).repartition(16)
    k = 10
    cand = {
        r["value"]
        for r in frequent.heavy_hitter_candidates(
            df.where(F.col("v").isNotNull()).select(F.col("v").alias("value")),
            "value",
            k,
        ).collect()
    }
    n = df.where(F.col("v").isNotNull()).count()
    true_hh = {
        r["v"]
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("v").isNotNull() & (F.col("cnt") * k > F.lit(n)))
        .collect()
    }
    assert true_hh <= cand


def test_heavy_hitters_rejects_k_below_two(spark):
    with pytest.raises(ValueError):
        frequent.heavy_hitters(_skewed_df(spark), "v", 1)
