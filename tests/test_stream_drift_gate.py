"""stream_drift_gate: the planted drifted batch is rejected, natural
batches commit, and committed counts equal gated counts (the replay
idempotence is proven inside the query itself — this pins the verdict
shape at the smallest fixture)."""

from cdc_application_febuary_spark.queries.pipeline_ops import QUERIES

SF = "/root/testdata/sf0.001"


def test_gate_verdicts_smallest_fixture(spark):
    rows = {
        r["batch_id"]: r
        for r in QUERIES["stream_drift_gate"](spark, SF).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for b in (0, 1, 2):
        assert rows[b]["accepted"]
        assert rows[b]["committed_rows"] == rows[b]["n_rows"] > 0
    assert not rows[3]["accepted"]
    assert rows[3]["committed_rows"] == 0
    assert rows[3]["psi_e6"] > 1_000_000  # the shift is unmistakable
