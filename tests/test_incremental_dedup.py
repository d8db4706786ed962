"""Incremental dedup: cross-batch novelty, in-batch collapse, replay safety."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import incremental_dedup as idd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_novelty(spark, tmp_path):
    store = str(tmp_path / "fp")
    b0 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    out0 = idd.dedup_batch(b0, store, 0)
    assert sorted(r["doc_id"] for r in out0.collect()) == [1, 2]

    # batch 1 repeats doc 1's text (new id) and adds one novel doc
    b1 = _docs(spark, [(10, "alpha beta"), (11, "epsilon zeta")])
    out1 = idd.dedup_batch(b1, store, 1)
    assert sorted(r["doc_id"] for r in out1.collect()) == [11]
    assert idd.store_stats(spark, store) == {"versions": 2, "fingerprints": 3}


def test_in_batch_duplicates_collapse_to_min_id(spark, tmp_path):
    store = str(tmp_path / "fp")
    b = _docs(spark, [(5, "same text"), (3, "same text"), (9, "other")])
    out = idd.dedup_batch(b, store, 0)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 9]


def test_fingerprint_ignores_whitespace_and_case(spark, tmp_path):
    store = str(tmp_path / "fp")
    idd.dedup_batch(_docs(spark, [(1, "Hello  World")]), store, 0)
    out = idd.dedup_batch(_docs(spark, [(2, "hello world")]), store, 1)
    assert out.count() == 0  # normalized-text fingerprint collapses them


def test_replay_is_dropped_whole(spark, tmp_path):
    store = str(tmp_path / "fp")
    b0 = _docs(spark, [(1, "a b c")])
    assert idd.dedup_batch(b0, store, 0).count() == 1
    # crash replay of batch 0: no re-admission, no store bloat
    assert idd.dedup_batch(b0, store, 0) is None
    assert idd.store_stats(spark, store) == {"versions": 1, "fingerprints": 1}

    # next batch proceeds normally
    out = idd.dedup_batch(_docs(spark, [(2, "d e f")]), store, 1)
    assert out.count() == 1
    assert idd.store_stats(spark, store)["fingerprints"] == 2


# --- near-dedup (MinHash band store) ---------------------------------------

BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight")
NEAR = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest today")
OTHER = ("completely different words about spark shuffles partitions "
         "joins aggregates windows and parquet row groups everywhere")


def test_near_dup_rejected_across_batches(spark, tmp_path):
    from cdc_application_febuary_spark.operators.incremental_dedup import (
        near_dedup_batch,
    )

    store = str(tmp_path / "bands")
    out0 = near_dedup_batch(_docs(spark, [(1, BASE)]), store, 0)
    assert [r["doc_id"] for r in out0.collect()] == [1]

    # batch 1: a near-duplicate (one word changed) and a novel doc
    out1 = near_dedup_batch(
        _docs(spark, [(10, NEAR), (11, OTHER)]), store, 1
    )
    assert sorted(r["doc_id"] for r in out1.collect()) == [11]


def test_in_batch_near_dups_collapse(spark, tmp_path):
    from cdc_application_febuary_spark.operators.incremental_dedup import (
        near_dedup_batch,
    )

    store = str(tmp_path / "bands")
    out = near_dedup_batch(
        _docs(spark, [(5, BASE), (3, NEAR), (9, OTHER)]), store, 0
    )
    # near-dup pair collapses to min id 3; 9 is unrelated
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 9]


def test_confirm_tier_rejects_true_near_dup(spark, tmp_path):
    """Low confirm threshold: the genuine near-dup is still rejected, and
    the companion signature store exists for future confirm probes."""
    from cdc_application_febuary_spark.operators.incremental_dedup import (
        _sig_store_path,
        near_dedup_batch,
    )
    from cdc_application_febuary_spark.sources import manifest_table as mt

    store = str(tmp_path / "bands")
    near_dedup_batch(_docs(spark, [(1, BASE)]), store, 0)
    out = near_dedup_batch(
        _docs(spark, [(10, NEAR), (11, OTHER)]), store, 1,
        confirm_threshold=0.2,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [11]
    assert mt.current_version(spark, _sig_store_path(store)) == 1


def test_confirm_tier_admits_low_similarity_candidate(spark, tmp_path):
    """High confirm threshold: a bucket collision alone no longer rejects —
    the signature-estimated Jaccard must clear the bar. BASE vs NEAR differ
    in one word (est jaccard ~0.5), so at 0.95 the candidate is admitted,
    across batches AND within a batch."""
    from cdc_application_febuary_spark.operators.incremental_dedup import (
        near_dedup_batch,
    )

    store = str(tmp_path / "bands")
    near_dedup_batch(_docs(spark, [(1, BASE)]), store, 0)
    out = near_dedup_batch(
        _docs(spark, [(10, NEAR)]), store, 1, confirm_threshold=0.95
    )
    assert [r["doc_id"] for r in out.collect()] == [10]

    store2 = str(tmp_path / "bands2")
    out2 = near_dedup_batch(
        _docs(spark, [(5, BASE), (3, NEAR)]), store2, 0,
        confirm_threshold=0.95,
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == [3, 5]

    # exact replica is rejected even at the strict threshold
    out3 = near_dedup_batch(
        _docs(spark, [(7, BASE)]), store2, 1, confirm_threshold=0.95
    )
    assert out3.count() == 0


def test_sig_pair_similarity_bounds(spark):
    from cdc_application_febuary_spark.operators.dedup import (
        minhash_signatures,
        sig_pair_similarity,
    )

    docs = _docs(spark, [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)])
    sigs = minhash_signatures(docs, num_hashes=32)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in sig_pair_similarity(pairs, sigs, sigs, 32).collect()
    }
    assert got[(1, 4)] == 1.0          # identical text -> identical sigs
    assert 0.2 < got[(1, 2)] < 0.9     # near-dup: mid-range estimate
    assert got[(1, 3)] < 0.2           # unrelated: near zero


def test_near_replay_dropped(spark, tmp_path):
    from cdc_application_febuary_spark.operators.incremental_dedup import (
        near_dedup_batch,
    )

    store = str(tmp_path / "bands")
    assert near_dedup_batch(_docs(spark, [(1, BASE)]), store, 0).count() == 1
    assert near_dedup_batch(_docs(spark, [(1, BASE)]), store, 0) is None
    # and the store did not grow a second version
    from cdc_application_febuary_spark.sources import manifest_table as mt

    assert mt.current_version(spark, store) == 0


def test_banding_param_mismatch_fails_loudly(spark, tmp_path):
    """ADVICE r2: probing a band store with different (num_hashes, bands,
    rows_per_band) hashes different signature slices — collisions silently
    become zero. The store records its parameters and a mismatched probe
    must raise, not re-admit historical near-duplicates."""
    import pytest

    store = str(tmp_path / "bands")
    idd.near_dedup_batch(
        _docs(spark, [(1, BASE)]), store, 0, num_hashes=32, bands=16
    )
    with pytest.raises(ValueError, match="lsh_params"):
        idd.near_dedup_batch(
            _docs(spark, [(2, NEAR)]), store, 1, num_hashes=64, bands=16
        )
    # matching parameters still probe fine (and reject the near-dup)
    out = idd.near_dedup_batch(
        _docs(spark, [(2, NEAR)]), store, 1, num_hashes=32, bands=16
    )
    assert out.count() == 0


def test_legacy_store_without_params_requires_two_row_bands(spark, tmp_path):
    """Stores written before parameter recording always banded 2-row
    slices; they stay probe-able at rows_per_band==2 and fail loudly
    otherwise."""
    import pytest

    from cdc_application_febuary_spark.operators.dedup import (
        band_table,
        minhash_signatures,
    )
    from cdc_application_febuary_spark.sources import manifest_table as mt

    store = str(tmp_path / "bands")
    sigs = minhash_signatures(_docs(spark, [(1, BASE)]), num_hashes=32)
    bt = band_table(sigs, bands=16, rows_per_band=2)
    mt.write_table(
        bt.select("id", "band", "bucket"),
        store,
        ["bucket"],
        mode="append",
        meta={"batch_id": 0},  # legacy commit: no lsh_params
    )
    with pytest.raises(ValueError, match="predates"):
        idd.near_dedup_batch(
            _docs(spark, [(2, NEAR)]), store, 1, num_hashes=64, bands=16
        )
    out = idd.near_dedup_batch(
        _docs(spark, [(2, NEAR)]), store, 1, num_hashes=32, bands=16
    )
    assert out.count() == 0  # 2-row probe still collides with legacy buckets


def test_new_store_accepts_any_banding_params(spark, tmp_path):
    """ADVICE r3: a brand-new store has nothing recorded and nothing to
    mismatch — the first batch with non-default banding (rows_per_band=4)
    must commit (and record its params), not raise the legacy-store
    error."""
    from cdc_application_febuary_spark.sources import manifest_table as mt

    store = str(tmp_path / "bands")
    out = idd.near_dedup_batch(
        _docs(spark, [(1, BASE)]), store, 0, num_hashes=64, bands=16
    )
    assert out.count() == 1
    meta = mt.read_commit_meta(spark, store, 0)
    assert meta["lsh_params"] == {
        "num_hashes": 64, "bands": 16, "rows_per_band": 4,
        "portable": False,
    }
    # and the recorded params now guard subsequent probes as usual
    import pytest

    with pytest.raises(ValueError, match="lsh_params"):
        idd.near_dedup_batch(
            _docs(spark, [(2, NEAR)]), store, 1, num_hashes=32, bands=16
        )
