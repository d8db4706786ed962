"""Bloom-prefiltered joins: exactness, no false negatives, plan shape."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import bloomjoin


def _sides(spark):
    big = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    small = spark.range(0, 50_000, 41).select(F.col("id").alias("k"))
    return big, small


def test_prefiltered_join_equals_plain_join(spark):
    big, small = _sides(spark)
    got = bloomjoin.bloom_prefilter_join(big, small, "k", m_bits=1 << 16)
    want = big.join(small, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_has_no_false_negatives_and_few_false_positives(spark):
    big, small = _sides(spark)
    bs = bloomjoin.keyset_bloom(small, "k", m_bits=1 << 16, k_hashes=5)
    surviving = big.where(
        bloomjoin.bloom_might_contain(bs, F.col("k"), 5)
    ).count()
    true_members = big.join(small, "k", "left_semi").count()
    assert surviving >= true_members          # never drops a real match
    assert surviving <= true_members * 1.10   # and stays close to it


def test_semi_join_mode(spark):
    big, small = _sides(spark)
    got = bloomjoin.bloom_prefilter_join(
        big, small, "k", how="left_semi", m_bits=1 << 16
    )
    want = big.join(small, "k", "left_semi")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_filter_sits_on_big_side_scan(spark):
    big, small = _sides(spark)
    out = bloomjoin.bloom_prefilter_join(big, small, "k", m_bits=1 << 14)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan  # the membership test is JVM-side, pre-join


def test_outer_join_rejected(spark):
    big, small = _sides(spark)
    with pytest.raises(ValueError):
        bloomjoin.bloom_prefilter_join(big, small, "k", how="left")
