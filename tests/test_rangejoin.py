"""Interval join: bucketized containment matches the naive theta join
exactly, across boundary semantics, keys, widths, and join types."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.rangejoin import interval_join


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 17.5), (5, 99.0), (6, -3.0)],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [
            (10, 0.0, 10.0),
            (11, 5.0, 15.0),   # overlaps 10
            (12, 17.5, 17.5),  # degenerate single point
            (13, -10.0, -1.0), # negative range
            (14, 50.0, 40.0),  # invalid: end < start, must match nothing
        ],
        "iid long, lo double, hi double",
    )
    return pts, ivs


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
@pytest.mark.parametrize("width", [1, 3, 100])
def test_matches_naive_theta_join(spark, closed, width):
    pts, ivs = _fixtures(spark)
    lo_op = ">=" if closed in ("both", "left") else ">"
    hi_op = "<=" if closed in ("both", "right") else "<"
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(
            ivs, F.expr(f"v {lo_op} lo AND v {hi_op} hi")
        ).collect()
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "v", "lo", "hi", bucket_width=width, closed=closed
        ).collect()
    )
    assert got == naive


def test_each_match_emitted_once(spark):
    pts, ivs = _fixtures(spark)
    out = interval_join(pts, ivs, "v", "lo", "hi", bucket_width=2).collect()
    keys = [(r["pid"], r["iid"]) for r in out]
    assert len(keys) == len(set(keys))


def test_left_join_keeps_unmatched_points(spark):
    pts, ivs = _fixtures(spark)
    out = interval_join(
        pts, ivs, "v", "lo", "hi", bucket_width=4, how="left"
    )
    rows = {r["pid"]: r for r in out.where(F.col("iid").isNull()).collect()}
    assert 5 in rows  # v=99 matches nothing
    assert out.select("pid").distinct().count() == pts.count()


def test_keyed_interval_join(spark):
    pts = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "k string, pid long, v double"
    )
    ivs = spark.createDataFrame(
        [("a", 10, 0.0, 10.0), ("b", 11, 6.0, 10.0)],
        "k string, iid long, lo double, hi double",
    )
    out = interval_join(
        pts, ivs, "v", "lo", "hi", on=["k"], bucket_width=3
    ).collect()
    assert [(r["pid"], r["iid"]) for r in out] == [(1, 10)]


def test_auto_bucket_width(spark):
    pts, ivs = _fixtures(spark)
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(ivs, F.expr("v >= lo AND v <= hi")).collect()
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "v", "lo", "hi").collect()
    )
    assert got == naive


def test_no_nested_loop_join_in_plan(spark):
    """The whole point: the physical plan must be an equi-join on the
    bucket, not a BroadcastNestedLoopJoin."""
    pts, ivs = _fixtures(spark)
    plan = (
        interval_join(pts, ivs, "v", "lo", "hi", bucket_width=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
