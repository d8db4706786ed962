"""Pairwise HLL intersection estimates (`operators/sketches.py:
pairwise_intersection_estimates`): pair coverage, and
inclusion-exclusion sanity on planted disjoint / identical / half-
overlapping sets (exact at these cardinalities — HLL sparse mode)."""

from cdc_application_febuary_spark.operators.sketches import (
    pairwise_intersection_estimates,
)


def _df(spark, sets):
    rows = [(s, v) for s, vals in sets.items() for v in vals]
    return spark.createDataFrame(rows, "shard string, v long")


def test_pair_coverage_and_planted_overlaps(spark):
    sets = {
        "a": range(0, 100),          # a ∩ b = 50..99 (half)
        "b": range(50, 150),         # b ∩ c = empty
        "c": range(200, 300),        # a ∩ c = empty
        "d": range(0, 100),          # d == a (full overlap)
    }
    out = {
        (r["shard_a"], r["shard_b"]): r
        for r in pairwise_intersection_estimates(
            _df(spark, sets), "v", "shard"
        ).collect()
    }
    assert set(out) == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")
    }
    for key, r in out.items():
        # inclusion-exclusion identity holds row-wise by construction
        assert r["est_intersection"] == r["est_a"] + r["est_b"] - r["est_union"]
    # sparse-mode HLL is exact at these cardinalities
    assert abs(out[("a", "b")]["est_intersection"] - 50) <= 3
    assert abs(out[("a", "c")]["est_intersection"] - 0) <= 3
    assert abs(out[("a", "d")]["est_intersection"] - 100) <= 3
    assert abs(out[("b", "c")]["est_intersection"] - 0) <= 3
