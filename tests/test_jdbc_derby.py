"""JDBC integration against embedded Derby — the one real database in the
container (the jars ship with Spark). Upgrades the JDBC source/sink layer
from spec-level to executed: partitioned range reads, predicate pushdown
into the database, batched appends with engine-specific DDL types,
incremental watermark polling, and the streaming foreachBatch sink
(reference S1/S9/S14 paths, transfer.py:831-1099 / sink_config.py:159-164).

Derby folds unquoted identifiers to UPPER while Spark writes quoted
lowercase columns, so pushdown predicates and partition columns use quoted
identifiers throughout.
"""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources.incremental import (
    PollState,
    changes_to_changelog,
    load_state,
    poll_changes,
    save_state,
)
from cdc_application_febuary_spark.sources.jdbc import (
    JdbcReadSpec,
    JdbcWriteSpec,
)


def _specs(db: str, table: str, **read_kw):
    common = dict(
        engine="derby", host="", port=0, database=db, user="app",
        password="app", table=table,
    )
    return JdbcWriteSpec(**common), JdbcReadSpec(**common, **read_kw)


def _sample(spark, n=100, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )


def test_roundtrip_partitioned_read_with_db_side_predicate(spark, tmp_path):
    db = str(tmp_path / "db")
    w, r = _specs(
        db,
        "T_ROUNDTRIP",
        partition_column='"k"',
        lower_bound=0,
        upper_bound=99,
        num_partitions=4,
        push_down_predicate='"v" >= 100',
    )
    w.write(_sample(spark, 100))
    out = r.read(spark)
    # the WHERE ran inside Derby (v>=100 <=> k>=50), split into 4 ranges
    assert out.rdd.getNumPartitions() == 4
    rows = {tuple(x) for x in out.collect()}
    assert rows == {(k, 2 * k, f"name_{k}") for k in range(50, 100)}


def test_dataframe_filter_pushes_into_derby(spark, tmp_path):
    db = str(tmp_path / "db")
    w, r = _specs(db, "T_PUSH")
    w.write(_sample(spark, 100))
    plan = (
        r.read(spark)
        .where(F.col("k") < 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # `*` marks a filter executed by the external engine, not Spark
    assert "*LessThan(k,10)" in plan
    assert r.read(spark).where(F.col("k") < 10).count() == 10


def test_auto_ddl_types_avoid_clob(spark, tmp_path):
    db = str(tmp_path / "db")
    w, r = _specs(db, "T_DDL")
    assert "varchar(4000)" in w.options(_sample(spark, 1))[
        "createTableColumnTypes"
    ]
    w.write(_sample(spark, 20))
    # Derby CLOBs reject comparisons; varchar keeps string pushdown legal
    got = r.read(spark).where(F.col("name") == "name_7").collect()
    assert [tuple(x) for x in got] == [(7, 14, "name_7")]


def test_append_mode_accumulates_batches(spark, tmp_path):
    db = str(tmp_path / "db")
    w, r = _specs(db, "T_APPEND")
    w.write(_sample(spark, 50))
    w.write(_sample(spark, 50, offset=50))
    assert r.read(spark).count() == 100


def test_incremental_poll_against_live_database(spark, tmp_path):
    db = str(tmp_path / "db")
    ckpt = str(tmp_path / "ckpt")
    w, r = _specs(db, "T_POLL")
    w.write(_sample(spark, 40))

    state = load_state(ckpt, offset_column="k")
    assert state.high_water is None
    first, state = poll_changes(r.read(spark), state)
    assert first.count() == 40 and state.high_water == 39
    save_state(state, ckpt)

    # nothing new: empty poll, watermark holds
    again, state = poll_changes(r.read(spark), state)
    assert again.count() == 0 and state.high_water == 39

    # new rows arrive; only they are polled, and the filter reaches Derby
    w.write(_sample(spark, 15, offset=40))
    state = load_state(ckpt, offset_column="k")
    fresh, state = poll_changes(r.read(spark), state)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "*GreaterThan(k,39)" in plan
    assert state.high_water == 54
    log = changes_to_changelog(fresh, op="c")
    got = log.select("k", "__op", "__deleted").collect()
    assert len(got) == 15
    assert all(x["__op"] == "c" and x["__deleted"] == "false" for x in got)


def test_streaming_foreachbatch_jdbc_sink(spark, tmp_path):
    from cdc_application_febuary_spark.streaming.sinks import jdbc_append_sink

    db = str(tmp_path / "db")
    feed = tmp_path / "feed"
    feed.mkdir()
    w, r = _specs(db, "T_STREAM")

    df = _sample(spark, 30)
    df.coalesce(1).write.mode("append").json(str(feed))
    stream = (
        spark.readStream.schema(df.schema).json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(jdbc_append_sink(w))
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = r.read(spark)
    assert out.count() == 30
    assert "__batch_id" in out.columns
    assert out.select("__batch_id").distinct().count() == 1
