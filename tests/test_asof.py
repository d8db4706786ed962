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
