"""bucketed_auc_score (operators/classifier.py): the quantile-bucket scale
path must agree with the exact MW-AUC when buckets don't merge scores, and
degrade gracefully (toward 0.5) when they do."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.classifier import (
    auc_score,
    bucketed_auc_score,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, float(s), y) for i, (s, y) in enumerate(pairs)],
        "id long, s double, y int",
    )


def test_matches_exact_auc_when_buckets_preserve_scores(spark):
    # 40 unique scores, 64 buckets -> every score keeps its own bucket,
    # so bucketed AUC == exact AUC
    pairs = [(i, 1 if i % 3 == 0 else 0) for i in range(40)]
    df = _df(spark, pairs)
    exact = auc_score(df, "s", "y").collect()[0]
    bucketed = bucketed_auc_score(df, "s", "y", "id", n_buckets=64).collect()[0]
    assert abs(bucketed["auc"] - exact["auc"]) < 1e-12
    assert bucketed["n_pos"] == exact["n_pos"]
    assert bucketed["n_neg"] == exact["n_neg"]


def test_perfect_separation(spark):
    pairs = [(i, 0) for i in range(20)] + [(100 + i, 1) for i in range(20)]
    df = _df(spark, pairs)
    row = bucketed_auc_score(df, "s", "y", "id", n_buckets=8).collect()[0]
    assert row["auc"] == 1.0


def test_single_bucket_is_half(spark):
    # everything merged into one bucket: all ties -> AUC exactly 0.5
    pairs = [(i, i % 2) for i in range(30)]
    row = bucketed_auc_score(
        _df(spark, pairs), "s", "y", "id", n_buckets=1
    ).collect()[0]
    assert row["auc"] == 0.5


def test_hand_computed_two_buckets(spark):
    # bucket 1 = rows 0..4 (1 pos), bucket 2 = rows 5..9 (4 pos)
    # ranks: bucket1 avg rank 3 (rows 1-5), bucket2 avg rank 8 (rows 6-10)
    # rank_sum_pos = 1*3 + 4*8 = 35 ; U = 35 - 5*6/2 = 20 ; n_pos*n_neg = 25
    pairs = [(i, 1 if i >= 4 else 0) for i in range(10)]
    # pos rows: 4..9 -> 6 pos? adjust: want 5 pos 5 neg
    pairs = [(i, 1 if i >= 5 else 0) for i in range(10)]
    row = bucketed_auc_score(
        _df(spark, pairs), "s", "y", "id", n_buckets=2
    ).collect()[0]
    # perfect split across the two buckets -> all pos above all neg,
    # but within-bucket ties don't matter since buckets are pure
    assert row["auc"] == 1.0
    # now mix: 1 pos in low bucket, 4 in high; 4 neg low, 1 neg high
    pairs = [(i, 1 if (i == 0 or i >= 6) else 0) for i in range(10)]
    row = bucketed_auc_score(
        _df(spark, pairs), "s", "y", "id", n_buckets=2
    ).collect()[0]
    # buckets: low rows 0-4 (1 pos, 4 neg), high rows 5-9 (4 pos, 1 neg)
    # avg ranks 3 and 8; rank_sum_pos = 3 + 4*8 = 35; U = 35-15 = 20; /25
    assert abs(row["auc"] - 0.8) < 1e-12
