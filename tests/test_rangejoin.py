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
        # F.broadcast on the reference side: the bare theta join plans a
        # CartesianProduct over two 8-partition Python-RDD frames, which
        # re-evaluates the pickled right side once per partition PAIR
        # (measured 3-6 s per toy-sized call; broadcast: 0.7 s) — same
        # rows, just a sane reference plan (r11 test-suite budget)
        for r in pts.join(
            F.broadcast(ivs), F.expr(f"v {lo_op} lo AND v {hi_op} hi")
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
        for r in pts.join(F.broadcast(ivs), F.expr("v >= lo AND v <= hi")).collect()
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "v", "lo", "hi").collect()
    )
    assert got == naive


def _bimodal(spark, n_short=4000, n_long=12, short_len=1.0, long_len=80_000.0):
    import numpy as np

    rng = np.random.default_rng(42)
    span = 1_000_000.0
    starts = rng.uniform(0, span, n_short + n_long)
    lens = np.r_[np.full(n_short, short_len), np.full(n_long, long_len)]
    ivs = spark.createDataFrame(
        [
            (i, float(s), float(s + l))
            for i, (s, l) in enumerate(zip(starts, lens))
        ],
        "iid long, lo double, hi double",
    )
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rng.uniform(0, span, 3000))],
        "pid long, v double",
    )
    return pts, ivs


def test_bimodal_width_bounds_candidate_blowup(spark):
    """The r1-flagged failure mode: p75 of a bimodal length mix picks the
    short width, and the long tail explodes into len/width buckets each.
    The histogram-cost width must keep total interval replication within a
    small multiple of the interval count."""
    from cdc_application_febuary_spark.operators.rangejoin import (
        auto_bucket_width,
    )

    pts, ivs = _bimodal(spark)
    w = auto_bucket_width(pts, ivs, "v", "lo", "hi")

    lens = [(r["hi"] - r["lo"]) for r in ivs.collect()]
    n = len(lens)
    # what the old default would have chosen: p75 == the short mode
    p75 = sorted(lens)[int(0.75 * n)]
    repl_p75 = sum(int(l / p75) + 1 for l in lens)
    repl_auto = sum(int(l / w) + 1 for l in lens)
    assert repl_p75 > 200 * n  # the old default genuinely blows up here
    assert repl_auto <= 8 * n  # the histogram width stays bounded
    # and the bucketed join still matches the naive theta join exactly
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(F.broadcast(ivs), F.expr("v >= lo AND v <= hi")).collect()
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "v", "lo", "hi").collect()
    )
    assert got == naive


@pytest.mark.parametrize(
    "n_short,n_long,short_len,long_len",
    [(500, 3, 0.5, 200_000.0), (1000, 0, 2.0, 2.0), (0, 40, 0.0, 50_000.0)],
)
def test_auto_width_property_mixes(spark, n_short, n_long, short_len, long_len):
    """Property across degenerate and mixed length distributions: the
    chosen width always keeps replication bounded and results exact."""
    from cdc_application_febuary_spark.operators.rangejoin import (
        auto_bucket_width,
    )

    pts, ivs = _bimodal(
        spark, n_short=n_short, n_long=n_long,
        short_len=short_len, long_len=long_len,
    )
    w = auto_bucket_width(pts, ivs, "v", "lo", "hi")
    assert w > 0
    lens = [(r["hi"] - r["lo"]) for r in ivs.collect()]
    repl = sum(int(l / w) + 1 for l in lens)
    assert repl <= 8 * max(len(lens), 1)
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(F.broadcast(ivs), F.expr("v >= lo AND v <= hi")).collect()
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
