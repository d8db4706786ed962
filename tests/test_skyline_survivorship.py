"""Round-4 operators: banded 2-D skyline and golden-record survivorship."""

import random

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.skyline import skyline_2d
from cdc_application_febuary_spark.operators import survivorship as sv


def _brute_skyline(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for j, (x2, y2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 7])
@pytest.mark.parametrize("band_width", [1, 3, 1000])
def test_skyline_matches_bruteforce(spark, seed, band_width):
    rng = random.Random(seed)
    pts = [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long").repartition(7)
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y", band_width).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_duplicates_and_ties_all_survive(spark):
    # duplicate frontier points survive together; dominated dupes don't
    pts = [(1, 5), (1, 5), (2, 5), (0, 9), (3, 3), (3, 3)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y", 2).collect())
    assert got == _brute_skyline(pts)
    assert got.count((1, 5)) == 2  # both copies kept
    assert (2, 5) not in got  # dominated by (1,5): same y, larger x


def test_skyline_has_no_unpartitioned_full_data_window(spark):
    """The whole point of the banded sweep: no window over the raw rows
    without a partition key. The plan's only unpartitioned window ranges
    over the per-band summary aggregate."""
    df = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(1000)], "x long, y long"
    )
    plan = (
        skyline_2d(df, "x", "y", 10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the full-data windows carry the band partition spec
    assert "partitionbyband" in plan.replace("#", "").replace(
        "_", ""
    ).lower().replace(" ", "") or "__band" in plan


def test_golden_records_rules(spark):
    rows = [
        # user 1: 'b' latest by ts; 'a' modal (2 of 3); ties none
        (1, 100, "a", 1.0, 10),
        (1, 101, "a", 2.0, 20),
        (1, 102, "b", 3.0, 30),
        # user 2: tie on modal count ('x' and 'y' once) -> smallest wins;
        # tie on latest ts -> larger event_id wins
        (2, 200, "y", 5.0, 40),
        (2, 201, "x", 6.0, 40),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts long"
    )
    out = sv.golden_records(
        df,
        "user_id",
        order_cols=["ts", "event_id"],
        latest_cols=["event_type"],
        modal_cols=["event_type"],
        extra_aggs=[F.sum("value").alias("total_value")],
    )
    got = {r["user_id"]: r.asDict() for r in out.collect()}
    assert got[1]["latest_event_type"] == "b"
    assert got[1]["top_event_type"] == "a"
    assert got[1]["first_seen"] == 10 and got[1]["last_seen"] == 30
    assert got[1]["n_records"] == 3
    assert got[2]["latest_event_type"] == "x"  # ts tie -> higher event_id
    assert got[2]["top_event_type"] == "x"  # count tie -> smallest value


def test_golden_records_partitioning_invariant(spark):
    rows = [
        (1, i, ["a", "b", "c"][i % 3], float(i), 1000 + i) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts long"
    )
    a = sv.golden_records(
        df.repartition(1), "user_id", ["ts", "event_id"],
        latest_cols=["event_type"], modal_cols=["event_type"],
    ).collect()
    b = sv.golden_records(
        df.repartition(13), "user_id", ["ts", "event_id"],
        latest_cols=["event_type"], modal_cols=["event_type"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
