"""Shallow clone (zero-copy) and commit-time expectations."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import manifest_table as mt


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])
    v = mt.shallow_clone(spark, src, dst)
    assert v == 0

    # same files, no data copied
    assert {e.path for e in mt._read_manifest(spark, dst, 0)} == {
        e.path for e in mt._read_manifest(spark, src, 0)
    }
    assert mt.read_table(spark, dst).count() == 100
    assert mt.read_commit_meta(spark, dst, 0)["operation"] == "clone"

    # divergence: writes to the clone never affect the source
    mt.merge_upsert(
        spark, dst,
        spark.createDataFrame([(1, 99)], "k long, v long"), ["k"],
    )
    assert mt.read_table(spark, dst).where("k = 1").first()["v"] == 99
    assert mt.read_table(spark, src).where("k = 1").first()["v"] == 1


def test_clone_pins_a_version(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 10), src, ["k"])
    mt.write_table(_df(spark, 0, 999), src, ["k"])  # v1
    mt.shallow_clone(spark, src, dst, version=0)
    assert mt.read_table(spark, dst).count() == 10


def test_expectations_gate_the_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    bad = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1)], "k long, v long"
    )
    with pytest.raises(mt.ExpectationViolation, match="v_not_null"):
        mt.write_table_with_expectations(
            bad, t, ["k"],
            {"v_not_null": "v IS NOT NULL", "v_nonneg": "v >= 0"},
        )
    # nothing committed
    assert mt.current_version(spark, t) is None

    good = spark.createDataFrame([(1, 5), (2, 0)], "k long, v long")
    v = mt.write_table_with_expectations(
        good, t, ["k"],
        {"v_not_null": "v IS NOT NULL", "v_nonneg": "v >= 0"},
    )
    assert v == 0
    assert mt.read_commit_meta(spark, t, 0)["expectations"] == [
        "v_nonneg", "v_not_null",
    ]


def test_check_expectations_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1), (4, 2)], "k long, v long"
    )
    counts = mt.check_expectations(
        df, {"not_null": "v IS NOT NULL", "nonneg": "v >= 0", "key": "k > 0"}
    )
    # NULL predicate results count as violations (v IS NULL row fails both)
    assert counts == {"not_null": 1, "nonneg": 2, "key": 0}
