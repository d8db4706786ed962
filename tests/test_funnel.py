"""Ordered funnel: strict sequencing, chain breaks, conversion math."""

import pytest

from cdc_application_febuary_spark.operators import funnel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts long"
    )


def test_order_matters(spark):
    ev = _events(
        spark,
        [
            (1, "a", 10), (1, "b", 20), (1, "c", 30),  # completes a->b->c
            (2, "b", 10), (2, "a", 20), (2, "c", 30),  # b before a: stops at b
            (3, "a", 10), (3, "c", 20),                # never does b
        ],
    )
    t = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel.funnel_times(ev, ["a", "b", "c"]).collect()
    }
    assert t[1] == (10, 20, 30)
    assert t[2] == (20, None, None)  # a at 20, no later b
    assert t[3] == (10, None, None)


def test_strictly_after_not_equal(spark):
    ev = _events(spark, [(1, "a", 10), (1, "b", 10)])  # simultaneous
    row = funnel.funnel_times(ev, ["a", "b"]).first()
    assert row["t2"] is None  # stage 2 must be strictly later


def test_earliest_qualifying_event_wins(spark):
    ev = _events(
        spark,
        [(1, "a", 10), (1, "b", 5), (1, "b", 15), (1, "b", 25)],
    )
    row = funnel.funnel_times(ev, ["a", "b"]).first()
    assert row["t2"] == 15  # earliest b AFTER a, not the global earliest


def test_counts_and_conversion(spark):
    ev = _events(
        spark,
        [
            (1, "a", 1), (1, "b", 2),
            (2, "a", 1), (2, "b", 2),
            (3, "a", 1),
            (4, "b", 1),  # never signs up: not in funnel at all
        ],
    )
    rows = {
        r["stage"]: (r["users"], r["conversion"])
        for r in funnel.funnel_counts(ev, ["a", "b"]).collect()
    }
    assert rows["a"] == (3, pytest.approx(1.0))
    assert rows["b"] == (2, pytest.approx(2 / 3, abs=1e-6))


def test_empty_stage_one(spark):
    ev = _events(spark, [(1, "x", 1)])
    rows = funnel.funnel_counts(ev, ["a", "b"]).collect()
    assert [(r["users"], r["conversion"]) for r in rows] == [(0, 0.0), (0, 0.0)]


def test_requires_stages(spark):
    ev = _events(spark, [(1, "a", 1)])
    with pytest.raises(ValueError):
        funnel.funnel_times(ev, [])


def test_max_gap_time_boxes_transitions(spark):
    ev = _events(
        spark,
        [
            (1, "a", 10), (1, "b", 15),           # within gap 10
            (2, "a", 10), (2, "b", 50),           # too late
            (3, "a", 10), (3, "b", 40), (3, "b", 15),  # earliest within gap
        ],
    )
    t = {
        r["user"]: r["t2"]
        for r in funnel.funnel_times(ev, ["a", "b"], max_gap=10).collect()
    }
    assert t[1] == 15
    assert t[2] is None   # b exists but outside the window
    assert t[3] == 15


def test_gap_applies_per_transition_not_total(spark):
    # a->b within gap, b->c within gap, but a->c total exceeds it: still converts
    ev = _events(spark, [(1, "a", 0), (1, "b", 9), (1, "c", 18)])
    row = funnel.funnel_times(ev, ["a", "b", "c"], max_gap=10).first()
    assert (row["t1"], row["t2"], row["t3"]) == (0, 9, 18)
