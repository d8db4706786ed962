"""The engine's SQL surface: register the catalog as views and answer
arbitrary Spark SQL — the reference's replicated targets are queried with
plain SQL by its verification scripts (SURVEY §2.3), so the engine must be
a SQL server over its tables, not just a fixed query set. Plus the
merge-upsert snapshot mode."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.catalog import register_views
from cdc_application_febuary_spark.operators.scd2 import (
    merge_upsert,
    to_scd2_rows,
)


def test_sql_join_window_over_views(spark, sf_dir):
    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT r_name, cnt, RANK() OVER (ORDER BY cnt DESC, r_name) AS rnk
        FROM (SELECT r.r_name, COUNT(*) AS cnt
              FROM customer c
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name)
        """
    )
    rows = df.collect()
    assert len(rows) == 5
    assert sum(r["cnt"] for r in rows) == spark.table("customer").count()
    assert min(r["rnk"] for r in rows) == 1


def test_sql_events_view_has_converted_ts(spark, sf_dir):
    register_views(spark, sf_dir)
    out = spark.sql(
        "SELECT MIN(CAST(ts AS DATE)) AS d FROM events"
    ).collect()[0]["d"]
    assert str(out) == "2024-01-01"  # nanos column converted in the view


def test_merge_upsert_snapshot(spark):
    base = spark.createDataFrame(
        [(1, "a", "c", 100), (2, "b", "c", 100)],
        ["id", "payload", "op", "source_ts_ms"],
    )
    target = to_scd2_rows(base, ["id", "payload"])
    changes_raw = spark.createDataFrame(
        [
            (2, "b2", "u", 200),   # update key 2
            (3, "c1", "c", 200),   # insert key 3
            (1, "a", "d", 200),    # delete key 1
        ],
        ["id", "payload", "op", "source_ts_ms"],
    )
    changes = to_scd2_rows(changes_raw, ["id", "payload"])
    snap = merge_upsert(target, changes, ["id"]).orderBy("id")
    got = [(r["id"], r["payload"]) for r in snap.collect()]
    assert got == [(2, "b2"), (3, "c1")]

    # applying the same changes again is idempotent (same snapshot)
    snap2 = merge_upsert(snap, changes, ["id"]).orderBy("id")
    assert [(r["id"], r["payload"]) for r in snap2.collect()] == got
