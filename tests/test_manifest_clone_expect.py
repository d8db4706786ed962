"""Shallow clone (zero-copy) and commit-time expectations."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import manifest_table as mt


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])
    v = mt.shallow_clone(spark, src, dst)
    assert v == 0

    # same files, no data copied
    assert {e.path for e in mt._read_manifest(spark, dst, 0)} == {
        e.path for e in mt._read_manifest(spark, src, 0)
    }
    assert mt.read_table(spark, dst).count() == 100
    assert mt.read_commit_meta(spark, dst, 0)["operation"] == "clone"

    # divergence: writes to the clone never affect the source
    mt.merge_upsert(
        spark, dst,
        spark.createDataFrame([(1, 99)], "k long, v long"), ["k"],
    )
    assert mt.read_table(spark, dst).where("k = 1").first()["v"] == 99
    assert mt.read_table(spark, src).where("k = 1").first()["v"] == 1


def test_clone_pins_a_version(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 10), src, ["k"])
    mt.write_table(_df(spark, 0, 999), src, ["k"])  # v1
    mt.shallow_clone(spark, src, dst, version=0)
    assert mt.read_table(spark, dst).count() == 10


def test_vacuum_pins_files_a_live_clone_references(spark, tmp_path):
    """Source VACUUM must not strand a shallow clone: the clone's
    registration pins the shared files even after the source has moved on
    and dropped the cloned version from its own retention window."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])
    mt.shallow_clone(spark, src, dst)
    assert mt.registered_clones(spark, src) == [dst]

    # source rewrites twice; keep_last=1 would normally free v0's files
    mt.write_table(_df(spark, 200, 250), src, ["k"], mode="overwrite")
    mt.write_table(_df(spark, 300, 350), src, ["k"], mode="overwrite")
    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 1

    # the clone still reads the full original snapshot
    assert mt.read_table(spark, dst).count() == 100
    assert mt.read_table(spark, src).count() == 50


def test_vacuum_prunes_dead_clone_and_frees_files(spark, tmp_path, monkeypatch):
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])
    mt.shallow_clone(spark, src, dst)
    mt.write_table(_df(spark, 200, 250), src, ["k"], mode="overwrite")

    shutil.rmtree(dst)  # drop the clone table entirely

    # a FRESH dead marker is skipped, not pruned (it could be a clone
    # whose manifest commit is still in flight) — and while young it
    # pins the source version it recorded, in case the commit IS in
    # flight (the ADVICE r2 race)
    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 1
    assert mt.registered_clones(spark, src) == [dst]  # still registered
    assert stats["data_files_removed"] == 0
    assert mt.read_table(spark, src).count() == 50

    # once stale, the registration is pruned and the files freed
    monkeypatch.setattr(mt, "_CLONE_PRUNE_AGE_MS", 0)
    stats2 = mt.vacuum(spark, src, keep_last=1)
    assert mt.registered_clones(spark, src) == []
    assert stats2["data_files_removed"] > 0


def test_vacuum_protects_clone_of_clone_transitively(spark, tmp_path):
    """B = clone(A), A = clone(src). After A is overwritten AND vacuumed,
    A's manifests no longer mention src's files — only the recursive walk
    src -> A -> B still finds B's pins on src's original data."""
    src = str(tmp_path / "src")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    mt.write_table(_df(spark, 0, 100), src, ["k"])
    mt.shallow_clone(spark, src, a)
    mt.shallow_clone(spark, a, b)

    mt.write_table(_df(spark, 500, 510), a, ["k"], mode="overwrite")
    mt.vacuum(spark, a, keep_last=1)  # drops A's v0 manifest

    mt.write_table(_df(spark, 600, 610), src, ["k"], mode="overwrite")
    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 2  # A (live) and B (via A)
    assert mt.read_table(spark, b).count() == 100  # B intact


def test_expectations_gate_the_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    bad = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1)], "k long, v long"
    )
    with pytest.raises(mt.ExpectationViolation, match="v_not_null"):
        mt.write_table_with_expectations(
            bad, t, ["k"],
            {"v_not_null": "v IS NOT NULL", "v_nonneg": "v >= 0"},
        )
    # nothing committed
    assert mt.current_version(spark, t) is None

    good = spark.createDataFrame([(1, 5), (2, 0)], "k long, v long")
    v = mt.write_table_with_expectations(
        good, t, ["k"],
        {"v_not_null": "v IS NOT NULL", "v_nonneg": "v >= 0"},
    )
    assert v == 0
    assert mt.read_commit_meta(spark, t, 0)["expectations"] == [
        "v_nonneg", "v_not_null",
    ]


def test_check_expectations_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1), (4, 2)], "k long, v long"
    )
    counts = mt.check_expectations(
        df, {"not_null": "v IS NOT NULL", "nonneg": "v >= 0", "key": "k > 0"}
    )
    # NULL predicate results count as violations (v IS NULL row fails both)
    assert counts == {"not_null": 1, "nonneg": 2, "key": 0}


def test_unique_keys_gate(spark, tmp_path):
    t = str(tmp_path / "t")
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    mt.write_table_with_expectations(ok, t, ["k"], {}, unique_keys=True)

    dup_batch = spark.createDataFrame([(2, "dup")], "k long, v string")
    with pytest.raises(mt.ExpectationViolation, match="__unique_keys"):
        mt.write_table_with_expectations(
            dup_batch, t, ["k"], {}, mode="append", unique_keys=True
        )
    # nothing was committed by the failed append
    assert mt.current_version(spark, t) == 0

    fresh = spark.createDataFrame([(3, "c")], "k long, v string")
    assert mt.write_table_with_expectations(
        fresh, t, ["k"], {}, mode="append", unique_keys=True
    ) == 1
    assert mt.read_table(spark, t).count() == 3

    # in-batch duplicates are caught on overwrite too
    bad = spark.createDataFrame([(9, "x"), (9, "y")], "k long, v string")
    with pytest.raises(mt.ExpectationViolation):
        mt.write_table_with_expectations(bad, t, ["k"], {}, unique_keys=True)


def test_restore_rolls_back_with_history_preserved(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_df(spark, 0, 10), t, ["k"])        # v0
    mt.write_table(_df(spark, 100, 103), t, ["k"])     # v1 (the bad commit)
    v = mt.restore_table(spark, t, 0)                  # v2 = v0's files
    assert v == 2
    assert mt.read_table(spark, t).count() == 10
    # forensics: the bad version is still readable
    assert mt.read_table(spark, t, version=1).count() == 3
    meta = mt.read_commit_meta(spark, t, 2)
    assert meta["operation"] == "restore" and meta["restored_version"] == 0
    # restore carries v0's schema pin
    assert "schema" in meta


def test_vacuum_during_inflight_clone_pins_recorded_version(spark, tmp_path):
    """ADVICE r2 (clone-pin race): a vacuum running between
    _register_clone and the clone's first manifest commit used to see a
    version-less clone, pin nothing, and free the very files the clone
    was about to reference. The marker now records the pinned source
    version and a young version-less registration pins that version."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])       # v0
    mt.write_table(_df(spark, 200, 250), src, ["k"], mode="overwrite")  # v1
    mt.write_table(_df(spark, 300, 350), src, ["k"], mode="overwrite")  # v2

    # simulate shallow_clone(version=0) crashing mid-flight: registration
    # written, manifest commit not yet
    mt._register_clone(spark, src, dst, source_version=0)

    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 1

    # the in-flight clone can now complete and read the full v0 snapshot
    mt.shallow_clone(spark, src, dst, version=0)
    assert mt.read_table(spark, dst).count() == 100


def test_vacuum_inflight_clone_legacy_marker_pins_everything(spark, tmp_path):
    """A pre-fix marker (no recorded source_version) pins the source's
    FULL referenced set while young — conservative, never stranding."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 100), src, ["k"])       # v0
    mt.write_table(_df(spark, 200, 250), src, ["k"], mode="overwrite")  # v1
    mt._register_clone(spark, src, dst)  # legacy: no source_version

    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 1
    mt.shallow_clone(spark, src, dst, version=0)
    assert mt.read_table(spark, dst).count() == 100


def test_vacuum_still_prunes_stale_versionless_registration(
    spark, tmp_path, monkeypatch
):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_df(spark, 0, 10), src, ["k"])
    mt._register_clone(spark, src, dst, source_version=0)
    monkeypatch.setattr(mt, "_CLONE_PRUNE_AGE_MS", 0)
    stats = mt.vacuum(spark, src, keep_last=1)
    assert stats["clones_protecting"] == 0
    assert mt.registered_clones(spark, src) == []
