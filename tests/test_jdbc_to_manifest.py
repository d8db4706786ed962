"""Full pipeline composition: Derby JDBC incremental polling into the
exactly-once manifest-table sink — the engine's layered story executed
end-to-end against a real database: pushdown polls, idempotent batch
commits, snapshot-isolated reads, time-travel change feed.
"""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import manifest_table as mt
from cdc_application_febuary_spark.sources.incremental import (
    PollState,
    poll_changes,
)
from cdc_application_febuary_spark.sources.jdbc import (
    JdbcReadSpec,
    JdbcWriteSpec,
)
from cdc_application_febuary_spark.streaming import manifest_sink as ms


def _specs(db: str, table: str):
    common = dict(
        engine="derby", host="", port=0, database=db, user="app",
        password="app", table=table,
    )
    return JdbcWriteSpec(**common), JdbcReadSpec(**common)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )


def test_incremental_poll_to_exactly_once_manifest(spark, tmp_path):
    db = str(tmp_path / "db")
    target = str(tmp_path / "target")
    w, r = _specs(db, "T_SRC")

    # batch 0: initial rows land in Derby, poll sees all of them
    w.write(_rows(spark, 0, 50))
    state = PollState(offset_column="k", high_water=None)
    changes, state = poll_changes(r.read(spark), state)
    assert ms.append_batch(changes, 0, target, ["k"]) == 0
    assert state.high_water == 49
    assert mt.read_table(spark, target).count() == 50

    # batch 1: new rows appended source-side; poll is incremental
    w.write(_rows(spark, 50, 80))
    changes, state = poll_changes(r.read(spark), state)
    assert changes.count() == 30  # only the delta, WHERE ran in Derby
    assert ms.append_batch(changes, 1, target, ["k"]) == 1
    assert state.high_water == 79

    # crash-replay of batch 1: dropped whole — still exactly 80 rows
    replay, _ = poll_changes(r.read(spark), PollState("k", 49))
    assert ms.append_batch(replay, 1, target, ["k"]) is None
    assert mt.read_table(spark, target).count() == 80
    assert mt.current_version(spark, target) == 1

    # snapshot isolation: version 0 still reads as the first 50 rows
    assert mt.read_table(spark, target, version=0).count() == 50

    # change feed between the two commits is exactly the polled delta
    feed = mt.change_feed(spark, target, 0, 1, ["k"])
    inserted = sorted(
        x["k"] for x in feed.where(F.col("__change_type") == "insert").collect()
    )
    assert inserted == list(range(50, 80))
