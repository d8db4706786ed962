"""Time-series: bucket rollup, gap-fill interpolation, inter-arrival stats,
Markov transitions."""

import datetime as dt

import pytest

from cdc_application_febuary_spark.operators import timeseries as ts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


D0 = dt.datetime(2024, 3, 1)


def _d(i, h=0):
    return D0 + dt.timedelta(days=i, hours=h)


def test_gap_fill_interpolates_interior_gaps_only(spark):
    rows = [
        # user 1: days 0 and 3 observed -> days 1,2 interpolated
        (1, 1, _d(0), 10.0),
        (2, 1, _d(3), 40.0),
        # user 2: single day -> no gaps, no extrapolation
        (3, 2, _d(5), 7.0),
    ]
    s = ts.bucket_series(_ev(spark, rows), "user_id", "ts", "value", "day")
    out = {
        (r["key"], r["bucket_ts"]): (r["value"], r["filled"])
        for r in ts.gap_fill_interpolate(s, 86400).collect()
    }
    assert out[(1, _d(0))] == (10.0, False)
    assert out[(1, _d(1))] == (pytest.approx(20.0), True)
    assert out[(1, _d(2))] == (pytest.approx(30.0), True)
    assert out[(1, _d(3))] == (40.0, False)
    assert out[(2, _d(5))] == (7.0, False)
    assert len(out) == 5


def test_bucket_series_sums_within_bucket_exactly(spark):
    rows = [(1, 1, _d(0, 1), 0.1), (2, 1, _d(0, 2), 0.2), (3, 1, _d(1), 5.0)]
    s = {
        r["bucket_ts"]: r["value"]
        for r in ts.bucket_series(
            _ev(spark, rows), "user_id", "ts", "value", "day"
        ).collect()
    }
    assert s[_d(0)] == 0.3  # decimal-exact, not 0.30000000000000004
    assert s[_d(1)] == 5.0


def test_interarrival_stats_values(spark):
    rows = [
        (1, 1, _d(0, 0), 0.0),
        (2, 1, _d(0, 1), 0.0),   # gap 3600s
        (3, 1, _d(0, 3), 0.0),   # gap 7200s
    ]
    df = _ev(spark, rows).withColumnRenamed("user_id", "k")
    out = ts.interarrival_stats(df, "k", "ts", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_gaps"] == 2
    assert r["mean_gap_s"] == 5400.0
    assert r["max_gap_s"] == 7200.0


def test_transition_matrix_counts_and_probs(spark):
    # sequences: user1 a->b->a ; user2 a->b
    data = [
        (1, 1, _d(0, 0), "a"), (2, 1, _d(0, 1), "b"), (3, 1, _d(0, 2), "a"),
        (4, 2, _d(0, 0), "a"), (5, 2, _d(0, 1), "b"),
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, state string"
    )
    out = {
        (r["from_state"], r["to_state"]): (r["cnt"], r["prob"])
        for r in ts.transition_matrix(
            df, "user_id", "ts", "state", "event_id"
        ).collect()
    }
    assert out[("a", "b")] == (2, 1.0)   # both a's are followed by b
    assert out[("b", "a")] == (1, 1.0)   # user2's trailing b has no successor
    assert len(out) == 2


def test_transition_matrix_tiebreak_is_deterministic(spark):
    same_ts = _d(0)
    data = [
        (10, 1, same_ts, "x"), (11, 1, same_ts, "y"), (12, 1, same_ts, "z"),
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, state string"
    )
    out = {
        (r["from_state"], r["to_state"])
        for r in ts.transition_matrix(
            df, "user_id", "ts", "state", "event_id"
        ).collect()
    }
    assert out == {("x", "y"), ("y", "z")}  # event_id order, always
