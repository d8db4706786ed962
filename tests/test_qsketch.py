"""Mergeable quantile sketches: accuracy bound, merge-invariance, size."""

import random

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import qsketch


def _df(spark, n_shards, per_shard, seed=4):
    rng = random.Random(seed)
    rows = [
        (s, rng.gauss(50.0, 15.0))
        for s in range(n_shards)
        for _ in range(per_shard)
    ]
    return spark.createDataFrame(rows, "shard long, v double")


def test_quantile_estimates_within_rank_error(spark):
    df = _df(spark, n_shards=8, per_shard=2000)
    sk = qsketch.shard_quantile_sketches(df, "v", "shard", k=100)
    est = {
        r["p"]: r["estimate"]
        for r in qsketch.merge_quantiles(sk, [0.1, 0.5, 0.9]).collect()
    }
    vals = sorted(r["v"] for r in df.collect())
    n = len(vals)
    for p, e in est.items():
        # rank error bound: one centroid per shard = 8 * 2000/100 = 160 rows
        lo = vals[max(0, int(p * n) - 400)]
        hi = vals[min(n - 1, int(p * n) + 400)]
        assert lo <= e <= hi


def test_sketch_size_bounded(spark):
    df = _df(spark, n_shards=3, per_shard=5000)
    rows = qsketch.shard_quantile_sketches(df, "v", "shard", k=50).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["centroids"]) == 50
        assert sum(c["w"] for c in r["centroids"]) == r["n"] == 5000


def test_merge_invariance_across_shardings(spark):
    rng = random.Random(11)
    vals = [rng.uniform(0, 1000) for _ in range(6000)]
    one = spark.createDataFrame([(0, v) for v in vals], "shard long, v double")
    many = spark.createDataFrame(
        [(i % 12, v) for i, v in enumerate(vals)], "shard long, v double"
    )
    q1 = {
        r["p"]: r["estimate"]
        for r in qsketch.merge_quantiles(
            qsketch.shard_quantile_sketches(one, "v", "shard", k=120),
            [0.25, 0.75],
        ).collect()
    }
    q2 = {
        r["p"]: r["estimate"]
        for r in qsketch.merge_quantiles(
            qsketch.shard_quantile_sketches(many, "v", "shard", k=120),
            [0.25, 0.75],
        ).collect()
    }
    for p in (0.25, 0.75):
        assert q1[p] == pytest.approx(q2[p], abs=25.0)  # ~2.5% of range


def test_small_shard_is_exact(spark):
    df = spark.createDataFrame(
        [(0, float(v)) for v in [1, 2, 3, 4, 5]], "shard long, v double"
    )
    sk = qsketch.shard_quantile_sketches(df, "v", "shard", k=100)
    est = {
        r["p"]: r["estimate"]
        for r in qsketch.merge_quantiles(sk, [0.2, 1.0]).collect()
    }
    assert est[0.2] == 1.0  # ceil(0.2*5)=1st value
    assert est[1.0] == 5.0


def test_string_shard_column(spark):
    rows = [("web", float(v)) for v in range(100)] + [
        ("books", float(v) * 2) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "source string, v double")
    sk = qsketch.shard_quantile_sketches(df, "v", "source", k=10)
    got = {r["shard"]: r["n"] for r in sk.collect()}
    assert got == {"web": 100, "books": 100}
    est = {
        r["p"]: r["estimate"]
        for r in qsketch.merge_quantiles(sk, [0.5]).collect()
    }
    assert 40 <= est[0.5] <= 110  # pooled median of the two distributions
