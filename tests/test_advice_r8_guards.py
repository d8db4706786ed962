"""Regression pins for the r8-ADVICE hardening (round 9): each guard must
fire loudly on the edge case it exists for and stay silent on the happy
path."""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_stratified_phantom_stratum_raises(spark):
    """A stratum present in counts but absent from df steals quota via
    allocate_exact, landing the sample below total_n — validate_counts
    must reject it (zero-count phantoms are harmless and allowed)."""
    from cdc_application_febuary_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        "id long, src string",
    )
    with pytest.raises(ValueError, match="names strata absent"):
        stratified_sample_exact(
            df, "src", "id", 4,
            counts={"a": 10, "b": 10, "zz": 5},
            validate_counts=True,
        )
    got = stratified_sample_exact(
        df, "src", "id", 4,
        counts={"a": 10, "b": 10, "zz": 0},  # zero-size phantom: fine
        validate_counts=True,
    )
    assert got.count() == 4


def test_sigcorr_overflow_guard_trips_before_sums_can_wrap(spark, tmp_path):
    """The guard bounds the INPUTS (n * MAX(ABS(x))^2 in double) rather
    than the final sums, which in non-ANSI Spark may already have wrapped
    and aliased to a small magnitude: one doc with n_chars ~2.2e9 makes
    n*mx^2 = 4.84e18 > 4e18 and must raise, not emit a correlation."""
    from cdc_application_febuary_spark.queries.corpus_ops import QUERIES

    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["tiny doc"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [2_200_000_000],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = QUERIES["quality_signal_correlation"](spark, str(tmp_path))
    with pytest.raises(Exception, match="overflow"):
        out.collect()


def test_session_processor_rejects_pre_start_event():
    """An input event preceding the stored session start means the feed
    violated the event-time-boundary split discipline; the processor must
    raise instead of silently corrupting or splitting the session."""
    from cdc_application_febuary_spark.compat.protobuf_compat import (
        ensure_protobuf,
    )

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available for transformWithState")
    from cdc_application_febuary_spark.streaming.stateful_v2 import (
        SessionWindowProcessor,
    )

    class _FakeState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class _FakeHandle:
        def __init__(self):
            self.timers = []

        def registerTimer(self, t):
            self.timers.append(t)

    def run(proc, ts_list):
        return list(
            proc.handleInputRows(
                (7,), [pd.DataFrame({"ts_us": ts_list})], None
            )
        )

    proc = SessionWindowProcessor(gap_ms=1)
    proc._sess = _FakeState()
    proc._handle = _FakeHandle()
    proc._sess.update((100_000, 200_000, 2))
    with pytest.raises(RuntimeError, match="precedes the stored session"):
        run(proc, [50_000])
    # happy path: in-span event merges without moving start/last
    proc._sess.update((100_000, 200_000, 2))
    assert run(proc, [150_000]) == []
    assert proc._sess.get() == (100_000, 200_000, 3)
    # happy path: in-gap extension moves last and re-registers the timer
    assert run(proc, [200_500]) == []
    assert proc._sess.get() == (100_000, 200_500, 4)
    assert proc._handle.timers[-1] == 200_500 // 1000 + 1


def test_embedding_fingerprint_empty_table_is_zero(spark):
    """An empty vector table fingerprints as 0 on BOTH engines (still a
    loud mismatch against any real calibration fp) instead of a NULL that
    TypeErrors at the int() call site."""
    from cdc_application_febuary_spark.operators.sampling import (
        embedding_fingerprint,
        embedding_fingerprint_sql,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    row = emb.transform(embedding_fingerprint).first()
    assert row["fixture_fp"] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    assert con.execute(embedding_fingerprint_sql()).fetchone()[0] == 0


def test_rocksdb_provider_unset_restores_unset(spark):
    """The restore pattern used by stream_session_eviction and the tws
    tests: when providerClass started UNSET it must end UNSET, not leak
    RocksDB into every later streaming query in the session."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if prev is not None:
        pytest.skip("session already pins a provider; nothing to check")
    from cdc_application_febuary_spark.streaming.stateful_v2 import (
        use_rocksdb_state,
    )

    use_rocksdb_state(spark)
    assert spark.conf.get(key, None) is not None
    # the fixed finally-branch
    spark.conf.unset(key)
    assert spark.conf.get(key, None) is None
