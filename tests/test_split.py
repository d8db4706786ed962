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


# ---------------------------------------------------------------------------
# Portable (md5) samplers — engine-parity tier
# ---------------------------------------------------------------------------
def test_portable_split_disjoint_exhaustive_and_stable(spark, rows):
    from cdc_application_febuary_spark.operators.sampling import (
        train_val_test_split_portable,
    )

    out = train_val_test_split_portable(rows, "doc_id", seed=7)
    assert out.count() == 2000
    assert out.where(F.col("split").isNull()).count() == 0
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split_portable(
            rows.repartition(17), "doc_id", seed=7
        ).collect()
    }
    assert full == shuffled


def test_portable_hash_matches_python_md5_reference(spark, rows):
    """The portable unit hash IS md5's leading 32 bits of "<id>:<seed>" —
    the exact contract the DuckDB oracle replays."""
    import hashlib

    from cdc_application_febuary_spark.operators.sampling import (
        portable_unit_hash32,
    )

    got = {
        r["doc_id"]: r["h"]
        for r in rows.limit(64)
        .select("doc_id", portable_unit_hash32("doc_id", 7).alias("h"))
        .collect()
    }
    for k, h in got.items():
        ref = int(hashlib.md5(f"{k}:7".encode()).hexdigest()[:8], 16)
        assert h == ref


def test_mixture_portable_anchor_never_downsampled(spark):
    from cdc_application_febuary_spark.operators.sampling import (
        mixture_portable,
    )

    big = spark.range(0, 1500).select(F.col("id").alias("doc_id"))
    small = spark.range(5000, 5200).select(F.col("id").alias("doc_id"))
    out = mixture_portable(
        {"big": big, "small": small},
        {"big": 1, "small": 1},
        id_col="doc_id",
        seed=42,
    )
    counts = {
        r["__mix_source"]: r["n"]
        for r in out.groupBy("__mix_source").agg(F.count("*").alias("n")).collect()
    }
    # anchor (scarcest) keeps every row; the big source downsamples toward it
    assert counts["small"] == 200
    assert counts["big"] == pytest.approx(200, rel=0.25)


def test_mixture_portable_rejects_float_weights(spark):
    from cdc_application_febuary_spark.operators.sampling import (
        mixture_portable,
    )

    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        mixture_portable({"a": df}, {"a": 0.5}, id_col="doc_id")
