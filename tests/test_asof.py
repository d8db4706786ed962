"""As-of join semantics on constructed cases."""

from cdc_application_febuary_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        ["k", "ts", "pay"],
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 18, 200), (2, 20, 300), (2, 15, 400)],
        ["k", "ts", "val"],
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(left, right, on=["k"], value_cols=["val"]).collect()
    }
    assert out[(1, 10)] == 100   # latest right at ts<=10 is ts=5
    assert out[(1, 20)] == 200   # ts=18
    assert out[(2, 15)] == 400   # equal timestamp matches (inclusive)
    assert out[(3, 5)] is None   # no right rows for key 3


def test_asof_backward_exclusive(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(
            left, right, on=["k"], value_cols=["val"], inclusive=False
        ).collect()
    }
    assert out[(2, 15)] is None  # equal timestamp no longer matches


def test_asof_keeps_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], value_cols=["val"])
    assert out.columns == ["k", "ts", "pay", "val"]
    assert out.count() == left.count()  # exactly one row per left row


def test_asof_matches_duckdb(spark):
    import duckdb

    left, right = _frames(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE L AS SELECT * FROM (VALUES (1,10,'a'),(1,20,'b'),"
        "(2,15,'c'),(3,5,'d')) t(k, ts, pay)"
    )
    con.execute(
        "CREATE TABLE R AS SELECT * FROM (VALUES (1,5,100),(1,18,200),"
        "(2,20,300),(2,15,400)) t(k, ts, val)"
    )
    duck = {
        (k, ts): val
        for k, ts, val in con.sql(
            "SELECT l.k, l.ts, r.val FROM L l ASOF LEFT JOIN R r "
            "ON l.k = r.k AND r.ts <= l.ts"
        ).fetchall()
    }
    ours = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(left, right, on=["k"], value_cols=["val"]).collect()
    }
    assert ours == duck


def test_asof_forward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(
            left, right, on=["k"], value_cols=["val"], direction="forward"
        ).collect()
    }
    # k=1: ts10 -> next right at 18 (200); ts20 -> none after
    # k=2: ts15 -> right at 15 inclusive (400); k=3: no rights
    assert got == {(1, 10): 200, (1, 20): None, (2, 15): 400, (3, 5): None}


def test_asof_forward_matches_duckdb(spark):
    import duckdb

    left, right = _frames(spark)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE L AS SELECT * FROM (VALUES (1,10,'a'),(1,20,'b'),"
        "(2,15,'c'),(3,5,'d')) t(k, ts, pay)"
    )
    con.execute(
        "CREATE TABLE R AS SELECT * FROM (VALUES (1,5,100),(1,18,200),"
        "(2,20,300),(2,15,400)) t(k, ts, val)"
    )
    duck = {
        (k, ts): val
        for k, ts, val in con.sql(
            "SELECT l.k, l.ts, r.val FROM L l ASOF LEFT JOIN R r "
            "ON l.k = r.k AND r.ts >= l.ts"
        ).fetchall()
    }
    ours = {
        (r["k"], r["ts"]): r["val"]
        for r in asof_join(
            left, right, on=["k"], value_cols=["val"], direction="forward"
        ).collect()
    }
    assert ours == duck


# --- nearest direction ------------------------------------------------------

def test_nearest_picks_closer_side_and_ties_go_backward(spark):
    import datetime as dt

    from cdc_application_febuary_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(100)), (1, ts(205)), (1, ts(300))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(90), "a"), (1, ts(210), "b"), (1, ts(400), "c")],
        "k long, ts timestamp, tag string",
    )
    out = {
        r["ts"]: r["tag"]
        for r in asof_join(
            left, right, ["k"], direction="nearest", value_cols=["tag"]
        ).collect()
    }
    assert out[ts(100)] == "a"   # 10s back vs 110s fwd
    assert out[ts(205)] == "b"   # 5s fwd vs 115s back
    assert out[ts(300)] == "b"   # 90s back vs 100s fwd


def test_nearest_matches_pandas_merge_asof(spark):
    import pandas as pd

    from cdc_application_febuary_spark.operators.asof import asof_join

    import random

    rng = random.Random(13)
    lrows = sorted(
        [(1, rng.randint(0, 10_000)) for _ in range(120)]
        + [(2, rng.randint(0, 10_000)) for _ in range(80)]
    )
    rrows = sorted(
        [(1, rng.randint(0, 10_000), rng.randint(0, 99)) for _ in range(60)]
        + [(2, rng.randint(0, 10_000), rng.randint(0, 99)) for _ in range(40)]
    )
    left = spark.createDataFrame(lrows, "k long, t long")
    right = spark.createDataFrame(rrows, "k long, t long, v long")
    got = (
        asof_join(
            left, right, ["k"], left_ts="t", right_ts="t",
            direction="nearest", value_cols=["v"],
        )
        .orderBy("k", "t")
        .collect()
    )
    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(rrows, columns=["k", "t", "v"])
        .sort_values("t", kind="stable")
        .drop_duplicates(subset=["k", "t"], keep="first")
    )
    want = (
        pd.merge_asof(lp, rp, on="t", by="k", direction="nearest")
        .sort_values(["k", "t"], kind="stable")
    )
    got_pairs = [(r["k"], r["t"], r["v"]) for r in got]
    want_pairs = [
        (int(k), int(t), None if pd.isna(v) else int(v))
        for k, t, v in zip(want["k"], want["t"], want["v"])
    ]
    # duplicate right timestamps make the matched VALUE ambiguous; compare
    # on rows whose matched distance is unambiguous by checking set sizes
    assert len(got_pairs) == len(want_pairs)
    mismatches = [
        (g, w) for g, w in zip(got_pairs, want_pairs) if g[:2] != w[:2]
    ]
    assert not mismatches
    # value agreement on the non-duplicated-timestamp majority
    agree = sum(1 for g, w in zip(got_pairs, want_pairs) if g == w)
    assert agree / len(got_pairs) > 0.9


def test_nearest_requires_inclusive(spark):
    import pytest as _pytest

    from cdc_application_febuary_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 9, 1.0)], "k long, t long, v double")
    with _pytest.raises(ValueError, match="inclusive"):
        asof_join(
            left, right, ["k"], left_ts="t", right_ts="t",
            direction="nearest", inclusive=False, value_cols=["v"],
        )


def test_null_payload_travels_with_winning_row(spark):
    """ADVICE r2: with per-column ignorenulls fills, a nearest/backward match
    whose value column is NULL leaked an OLDER row's value. The struct carry
    must emit the matched row's payload verbatim — nulls included."""
    from cdc_application_febuary_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    # nearest right row (t=99) has v NULL; an older row (t=50) has v=7
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 99, None)], "k long, t long, v long"
    )
    for direction in ("backward", "nearest"):
        row = asof_join(
            left, right, ["k"], left_ts="t", right_ts="t",
            direction=direction, value_cols=["v"],
        ).collect()[0]
        assert row["v"] is None, direction
    # forward: nearest following row (t=120) NULL, later row (t=200) has 9
    right_f = spark.createDataFrame(
        [(1, 120, None), (1, 200, 9)], "k long, t long, v long"
    )
    row = asof_join(
        left, right_f, ["k"], left_ts="t", right_ts="t",
        direction="forward", value_cols=["v"],
    ).collect()[0]
    assert row["v"] is None


def test_nearest_gap_exact_for_epoch_nanos(spark):
    """ADVICE r2: double-cast gaps lose ~256ns per operand at epoch-nanos
    magnitude (~1.7e18 > 2^53), so sides differing by <0.5us could swap.
    The DECIMAL(38,0) comparison must pick the truly nearer side."""
    from cdc_application_febuary_spark.operators.asof import asof_join

    base = 1_700_000_000_000_000_000  # ~2023 in epoch nanos
    # backward gap 1000ns, forward gap 999ns -> forward wins by 1ns;
    # both gaps round to the same double, and a double comparison with
    # tie-goes-backward would pick the backward side.
    left = spark.createDataFrame([(1, base)], "k long, t long")
    right = spark.createDataFrame(
        [(1, base - 1000, "back"), (1, base + 999, "fwd")],
        "k long, t long, side string",
    )
    row = asof_join(
        left, right, ["k"], left_ts="t", right_ts="t",
        direction="nearest", value_cols=["side"],
    ).collect()[0]
    assert row["side"] == "fwd"
    # and the mirror: backward gap 999ns, forward 1000ns -> backward
    right2 = spark.createDataFrame(
        [(1, base - 999, "back"), (1, base + 1000, "fwd")],
        "k long, t long, side string",
    )
    row2 = asof_join(
        left, right2, ["k"], left_ts="t", right_ts="t",
        direction="nearest", value_cols=["side"],
    ).collect()[0]
    assert row2["side"] == "back"
