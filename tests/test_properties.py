"""Property-based checks (hypothesis) for the semantics that must hold on
ANY changelog, not just the fixtures. Python reference implementations act
as executable specifications."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.scd2 import (
    current_state,
    to_scd2_rows,
)

OPS = ("c", "r", "u", "d")

events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),    # key
        st.sampled_from(OPS),                      # op
        st.integers(min_value=0, max_value=50),    # payload
    ),
    min_size=1,
    max_size=25,
)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _reference_current_state(rows):
    """Last-writer-wins over (key, seq); drop keys whose latest op is d."""
    latest = {}
    for seq, (k, op, payload) in enumerate(rows):
        latest[k] = (op, payload)
    return {k: p for k, (op, p) in latest.items() if op != "d"}


@given(events)
@SLOW
def test_current_state_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(k, op, p, i) for i, (k, op, p) in enumerate(rows)],
        ["id", "op", "payload", "source_ts_ms"],
    )
    scd2 = to_scd2_rows(df, ["id", "payload"])
    got = {
        r["id"]: r["payload"]
        for r in current_state(scd2, ["id"]).collect()
    }
    assert got == _reference_current_state(rows)


@given(events)
@SLOW
def test_scd2_rows_preserve_every_event(spark, rows):
    df = spark.createDataFrame(
        [(k, op, p, i) for i, (k, op, p) in enumerate(rows)],
        ["id", "op", "payload", "source_ts_ms"],
    )
    scd2 = to_scd2_rows(df, ["id", "payload"])
    # append-only: nothing is dropped, deletes are rewritten not removed
    assert scd2.count() == len(rows)
    n_deletes = sum(1 for _, op, _ in rows if op == "d")
    assert scd2.where(F.col("__deleted") == "true").count() == n_deletes
