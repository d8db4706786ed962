"""SCD2 append-log semantics: current-state reconstruction drops
delete-latest keys, history validity spans."""

from cdc_application_febuary_spark.operators.scd2 import (
    current_state,
    history_with_validity,
    normalized_op_counts,
    to_scd2_rows,
)


def _changelog(spark):
    # key 1: insert -> update (live); key 2: insert -> delete (dead);
    # key 3: insert only (live)
    rows = [
        (1, "a1", "c", 100),
        (1, "a2", "u", 200),
        (2, "b1", "c", 100),
        (2, "b1", "d", 300),
        (3, "c1", "r", 150),
    ]
    return spark.createDataFrame(rows, ["id", "payload", "op", "source_ts_ms"])


def test_to_scd2_rows(spark):
    out = to_scd2_rows(_changelog(spark), ["id", "payload"]).collect()
    assert {r["__op"] for r in out} == {"c", "u", "d", "r"}
    deleted = [r for r in out if r["__deleted"] == "true"]
    assert len(deleted) == 1 and deleted[0]["id"] == 2


def test_current_state_drops_deleted_keys(spark):
    scd2 = to_scd2_rows(_changelog(spark), ["id", "payload"])
    cur = current_state(scd2, ["id"]).orderBy("id").collect()
    assert [(r["id"], r["payload"]) for r in cur] == [(1, "a2"), (3, "c1")]


def test_current_state_keep_deleted(spark):
    scd2 = to_scd2_rows(_changelog(spark), ["id", "payload"])
    cur = current_state(scd2, ["id"], keep_deleted=True).orderBy("id").collect()
    assert len(cur) == 3
    assert cur[1]["__deleted"] == "true"


def test_history_validity(spark):
    scd2 = to_scd2_rows(_changelog(spark), ["id", "payload"])
    hist = history_with_validity(scd2, ["id"]).orderBy("id", "valid_from").collect()
    k1 = [r for r in hist if r["id"] == 1]
    assert k1[0]["valid_to"] == 200 and not k1[0]["is_current"]
    assert k1[1]["valid_to"] is None and k1[1]["is_current"]


def test_normalized_op_counts(spark):
    out = normalized_op_counts(_changelog(spark)).collect()
    got = {r["event_type"]: r["cnt"] for r in out}
    assert got == {"insert": 3, "update": 1, "delete": 1}
