"""SCD2 compaction: snapshot rewrite, delete dropping, archive, and
append-after-compact continuity; upsert-mode polling."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.compaction import (
    compact_scd2_target,
)
from cdc_application_febuary_spark.operators.scd2 import (
    current_state,
    to_scd2_rows,
)
from cdc_application_febuary_spark.sources.incremental import (
    PollState,
    changes_to_changelog,
    poll_changes,
)


def _write_log(spark, path):
    rows = [
        (1, "a1", "c", 100),
        (1, "a2", "u", 200),   # key 1: two versions
        (2, "b1", "c", 100),
        (2, "b1", "d", 300),   # key 2: deleted
        (3, "c1", "c", 150),
    ]
    log = to_scd2_rows(
        spark.createDataFrame(rows, ["id", "payload", "op", "source_ts_ms"]),
        ["id", "payload"],
    )
    log.write.mode("overwrite").parquet(path)


def test_compaction_snapshot(spark, tmp_path):
    target = str(tmp_path / "target")
    compacted = str(tmp_path / "compacted")
    archive = str(tmp_path / "archive")
    _write_log(spark, target)

    stats = compact_scd2_target(
        spark, target, compacted, ["id"], archive_path=archive
    )
    assert stats.rows_before == 5
    assert stats.rows_after == 2          # keys 1 and 3
    assert stats.deleted_keys_dropped == 1  # key 2

    snap = spark.read.parquet(compacted).orderBy("id")
    assert [(r["id"], r["payload"]) for r in snap.collect()] == [
        (1, "a2"), (3, "c1"),
    ]
    # full history preserved in the archive
    assert spark.read.parquet(archive).count() == 5


def test_compacted_log_accepts_new_appends(spark, tmp_path):
    target = str(tmp_path / "t")
    compacted = str(tmp_path / "c")
    _write_log(spark, target)
    compact_scd2_target(spark, target, compacted, ["id"])

    # stream more changes onto the compacted log: update 1, re-insert 2
    more = to_scd2_rows(
        spark.createDataFrame(
            [(1, "a3", "u", 400), (2, "b2", "c", 500)],
            ["id", "payload", "op", "source_ts_ms"],
        ),
        ["id", "payload"],
    )
    more.write.mode("append").parquet(compacted)
    cur = current_state(
        spark.read.parquet(compacted), ["id"]
    ).orderBy("id")
    assert [(r["id"], r["payload"]) for r in cur.collect()] == [
        (1, "a3"), (2, "b2"), (3, "c1"),
    ]


def test_upsert_mode_polling(spark):
    # poll on updated_ms: re-polled keys arrive as 'u' and the window
    # resolves them against earlier versions
    v1 = spark.createDataFrame([(1, "old", 1000)], ["id", "name", "updated_ms"])
    changes1, state = poll_changes(v1, PollState("updated_ms"))
    log1 = changes_to_changelog(changes1, ts_ms_col="updated_ms", op="u")

    v2 = spark.createDataFrame(
        [(1, "new", 2000), (2, "x", 1500)], ["id", "name", "updated_ms"]
    )
    changes2, _ = poll_changes(v2, state)
    assert changes2.count() == 2  # both rows are past the 1000 watermark
    log2 = changes_to_changelog(changes2, ts_ms_col="updated_ms", op="u")

    full = log1.unionByName(log2)
    cur = current_state(full, ["id"], order_cols=["__source_ts_ms"]).orderBy("id")
    assert [(r["id"], r["name"]) for r in cur.collect()] == [
        (1, "new"), (2, "x"),
    ]
