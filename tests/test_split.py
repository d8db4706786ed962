"""Train/val/test splitting: disjoint-exhaustive, stable, leakage-safe."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.sampling import (
    train_val_test_split,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id")).persist()


def test_every_row_in_exactly_one_split(spark, rows):
    out = train_val_test_split(rows, "doc_id")
    assert out.count() == 2000
    assert out.where(F.col("split").isNull()).count() == 0
    assert set(r["split"] for r in out.select("split").distinct().collect()) == {
        "train", "val", "test",
    }


def test_proportions_approximate(spark, rows):
    counts = {
        r["split"]: r["n"]
        for r in train_val_test_split(rows, "doc_id")
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["train"] == pytest.approx(1600, rel=0.08)
    assert counts["val"] == pytest.approx(200, rel=0.30)
    assert counts["test"] == pytest.approx(200, rel=0.30)


def test_stable_under_repartition_and_subset(spark, rows):
    full = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(rows, "doc_id").collect()
    }
    shuffled = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(rows.repartition(17), "doc_id").collect()
    }
    assert full == shuffled
    # incremental arrival: a subset's assignments are unchanged
    subset = rows.where(F.col("doc_id") < 500)
    sub = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(subset, "doc_id").collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_seed_changes_assignment(spark, rows):
    a = {r["doc_id"]: r["split"]
         for r in train_val_test_split(rows, "doc_id", seed=0).collect()}
    b = {r["doc_id"]: r["split"]
         for r in train_val_test_split(rows, "doc_id", seed=1).collect()}
    assert a != b


def test_group_split_prevents_leakage(spark):
    # rows carry a cluster id; splitting on the CLUSTER keeps all members
    # of a near-dup cluster in one split
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 40).alias("cluster")
    )
    out = train_val_test_split(df, "cluster")
    per_cluster = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_cluster)


def test_validates_fractions(spark, rows):
    with pytest.raises(ValueError, match="sum to 1"):
        train_val_test_split(rows, "doc_id", {"a": 0.5, "b": 0.2})
