"""Incremental polling source: only-new-rows semantics, state round-trip,
pushdown-friendly predicate, changelog shaping."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.scd2 import current_state
from cdc_application_febuary_spark.sources.incremental import (
    PollState,
    changes_to_changelog,
    load_state,
    poll_changes,
    save_state,
)


def test_first_poll_sees_everything(spark):
    t = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    changes, state = poll_changes(t, PollState("id"))
    assert changes.count() == 2
    assert state.high_water == 2


def test_subsequent_poll_sees_only_new_rows(spark, tmp_path):
    path = str(tmp_path / "table")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]).write.parquet(path)
    ck = str(tmp_path / "ck")

    state = load_state(ck, "id")
    changes, state = poll_changes(spark.read.parquet(path), state)
    assert changes.count() == 2
    save_state(state, ck)

    # new rows land; a fresh process restores state and polls
    spark.createDataFrame([(3, "c"), (4, "d")], ["id", "name"]).write.mode(
        "append"
    ).parquet(path)
    state2 = load_state(ck, "id")
    assert state2.high_water == 2  # state survived the "restart"
    changes2, state2 = poll_changes(spark.read.parquet(path), state2)
    assert sorted(r["id"] for r in changes2.collect()) == [3, 4]
    assert state2.high_water == 4


def test_empty_poll_keeps_offset(spark):
    t = spark.createDataFrame([(1, "a")], ["id", "name"])
    _, s1 = poll_changes(t, PollState("id"))
    changes, s2 = poll_changes(t, s1)
    assert changes.count() == 0
    assert s2.high_water == s1.high_water  # no regression on empty polls


def test_poll_predicate_pushes_down(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(path)
    changes, _ = poll_changes(
        spark.read.parquet(path), PollState("id", high_water=90)
    )
    plan = changes._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)" in plan


def test_changelog_shaping_feeds_scd2(spark):
    t = spark.createDataFrame(
        [(1, "a", 1000), (2, "b", 2000)], ["id", "name", "updated_ms"]
    )
    changes, _ = poll_changes(t, PollState("updated_ms"))
    log = changes_to_changelog(changes, ts_ms_col="updated_ms")
    assert {r["__op"] for r in log.collect()} == {"c"}
    cur = current_state(log, ["id"], order_cols=["__source_ts_ms"])
    assert cur.count() == 2
