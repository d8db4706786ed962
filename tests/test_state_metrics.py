"""stream_state_metrics_report: the state-store observability report must
obey the accounting identities of the state model it claims to verify,
and the health thresholds must bucket exactly (VERDICT r8 item 4)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark):
    from cdc_application_febuary_spark.queries.pipeline_ops import QUERIES

    rows = QUERIES["stream_state_metrics_report"](spark, SF).collect()
    return sorted(rows, key=lambda r: r["batch_id"])


def test_covers_exactly_the_data_batches(report):
    assert [r["batch_id"] for r in report] == [0, 1, 2, 3, 4, 5]
    assert all(r["operator_name"] == "stateStoreSave" for r in report)


def test_state_accounting_identities(report):
    # batch 0 runs under the epoch watermark: nothing can be evicted
    assert report[0]["rows_removed"] == 0
    assert report[0]["rows_in_state"] == report[0]["rows_updated"]
    # rows_in_state is entered-minus-left: it can never grow by more than
    # the batch's updated groups, and never drop by more than removed
    for prev, cur in zip(report, report[1:]):
        delta = cur["rows_in_state"] - prev["rows_in_state"]
        assert delta <= cur["rows_updated"] - cur["rows_removed"]
        assert delta >= -cur["rows_removed"]
    # the sentinel batches carry exactly one input row each
    assert report[4]["input_rows"] == 1
    assert report[5]["input_rows"] == 1
    # after the z2 eviction batch only the sentinel window group remains
    assert report[5]["rows_in_state"] == 1


def test_health_thresholds_bucket_exactly(report):
    for r in report:
        n = r["rows_in_state"]
        want = "critical" if n >= 500 else "warning" if n >= 30 else "ok"
        assert r["state_health"] == want, (r["batch_id"], n, r["state_health"])


def test_health_thresholds_two_buckets_at_driver_sf(spark):
    """At the driver gate's sf0.01 the dense batches sit in 'warning'
    while the post-eviction tail is 'ok' — both buckets exercised (the
    sf0.001 feed above is too sparse to leave 'ok')."""
    from cdc_application_febuary_spark.queries.pipeline_ops import QUERIES

    rows = QUERIES["stream_state_metrics_report"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {r["state_health"] for r in rows} == {"ok", "warning"}
