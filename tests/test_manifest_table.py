"""Manifest-committed parquet tables: snapshot isolation, optimistic
conflict detection, and file-pruned copy-on-write MERGE."""

import pytest
from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources.manifest_table import (
    CommitConflict,
    _read_manifest,
    _write_manifest_atomic,
    change_feed,
    current_version,
    merge_upsert,
    read_table,
    snapshots,
    table_rows,
    vacuum,
    version_as_of,
    write_table,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_write_read_roundtrip_and_versions(spark, tmp_path):
    t = str(tmp_path / "t1")
    assert current_version(spark, t) is None
    v0 = write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    assert v0 == 0
    v1 = write_table(_df(spark, [(3, "c")]), t, ["k"], mode="append")
    assert v1 == 1
    got = {(r["k"], r["v"]) for r in read_table(spark, t).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_table_rows_matches_scan_every_version(spark, tmp_path):
    """table_rows (manifest-entry stat sum, zero jobs) must equal the
    full-scan count on every committed version — the r10 replacement for
    lifecycle queries' per-fold store-count scans."""
    t = str(tmp_path / "trows")
    with pytest.raises(FileNotFoundError):
        table_rows(spark, t)
    write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, ["k"])
    write_table(_df(spark, [(4, "d")]), t, ["k"], mode="append")
    write_table(_df(spark, [(9, "z"), (10, "y")]), t, ["k"], mode="overwrite")
    for v in (0, 1, 2):
        assert table_rows(spark, t, version=v) == read_table(
            spark, t, version=v
        ).count()
    assert table_rows(spark, t) == 2


def test_footer_stats_match_scan_stats(spark, tmp_path):
    """The r10 footer-based staging stats must be value-identical to the
    scan-based aggregate they replaced — stats drive file pruning, so a
    divergence here silently corrupts reads. Covers int/long/string keys,
    a null-bearing string key, an all-null key, and the fallback type."""
    from cdc_application_febuary_spark.sources.manifest_table import (
        _stage_files,
    )

    df = spark.createDataFrame(
        [
            (i, i * 10, f"{i:032x}" if i % 5 else None, float(i))
            for i in range(100)
        ],
        "ki int, kl long, ks string, v double",
    ).repartition(4)
    entries = _stage_files(df, str(tmp_path / "tf"), ["ki", "kl", "ks"])
    staged = spark.read.parquet(*[e.path for e in entries]).withColumn(
        "__file", F.input_file_name()
    )
    aggs = [F.count(F.lit(1)).alias("rows")]
    for k in ("ki", "kl", "ks"):
        aggs += [F.min(k).alias(f"mn_{k}"), F.max(k).alias(f"mx_{k}")]

    def _norm(p):
        return p.replace("file:///", "file:/")

    scan = {
        _norm(r["__file"]): r
        for r in staged.groupBy("__file").agg(*aggs).collect()
    }
    for e in entries:
        r = scan[_norm(e.path)]
        assert e.rows == r["rows"]
        for k in ("ki", "kl", "ks"):
            assert e.key_min[k] == r[f"mn_{k}"]
            assert e.key_max[k] == r[f"mx_{k}"]
    # all-null key column: min/max None, rows still counted
    nulls = _stage_files(
        spark.createDataFrame([(None, i) for i in range(10)], "ks string, v int"),
        str(tmp_path / "tn"),
        ["ks"],
    )
    assert sum(e.rows for e in nulls) == 10
    assert all(e.key_min["ks"] is None and e.key_max["ks"] is None for e in nulls)


def test_overwrite_replaces_snapshot(spark, tmp_path):
    t = str(tmp_path / "t2")
    write_table(_df(spark, [(1, "a")]), t, ["k"])
    write_table(_df(spark, [(9, "z")]), t, ["k"], mode="overwrite")
    got = [(r["k"], r["v"]) for r in read_table(spark, t).collect()]
    assert got == [(9, "z")]


def test_reader_sees_committed_snapshot_not_staged_files(spark, tmp_path):
    """Crash-mid-write safety: stage data files WITHOUT committing a
    manifest — a reader must still resolve the previous version."""
    t = str(tmp_path / "t3")
    write_table(_df(spark, [(1, "a")]), t, ["k"])
    # simulate a dying writer: parquet lands, no manifest rename
    _df(spark, [(2, "orphan")]).write.parquet(f"{t}/data-orphan")
    got = [(r["k"], r["v"]) for r in read_table(spark, t).collect()]
    assert got == [(1, "a")]


def test_commit_conflict_raises(spark, tmp_path):
    t = str(tmp_path / "t4")
    write_table(_df(spark, [(1, "a")]), t, ["k"])
    entries = _read_manifest(spark, t, 0)
    _write_manifest_atomic(spark, t, 1, entries)  # a "concurrent" writer
    with pytest.raises(CommitConflict):
        _write_manifest_atomic(spark, t, 1, entries)


def test_merge_upserts_and_inserts(spark, tmp_path):
    t = str(tmp_path / "t5")
    write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    stats = merge_upsert(
        spark, t, _df(spark, [(2, "B2"), (5, "e")]), ["k"]
    )
    assert stats["version"] == 1
    got = {(r["k"], r["v"]) for r in read_table(spark, t).collect()}
    assert got == {(1, "a"), (2, "B2"), (5, "e")}


def test_merge_deletes_via_flag(spark, tmp_path):
    t = str(tmp_path / "t6")
    write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    changes = spark.createDataFrame(
        [(2, None, True), (3, "c", False)], "k long, v string, is_del boolean"
    )
    merge_upsert(spark, t, changes, ["k"], delete_col="is_del")
    got = {(r["k"], r["v"]) for r in read_table(spark, t).collect()}
    assert got == {(1, "a"), (3, "c")}


def test_merge_prunes_untouched_files(spark, tmp_path):
    """The 100 TB property: a batch touching keys 0..99 must not rewrite
    files holding keys 100_000+."""
    t = str(tmp_path / "t7")
    low = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("low").alias("v")
    ).repartition(4)
    high = spark.range(100_000, 101_000).select(
        F.col("id").alias("k"), F.lit("high").alias("v")
    ).repartition(4)
    write_table(low, t, ["k"])
    write_table(high, t, ["k"], mode="append")
    n_files = len(_read_manifest(spark, t, 1))
    assert n_files >= 8

    stats = merge_upsert(spark, t, _df(spark, [(5, "LOW5")]), ["k"])
    # only the low-range files overlap the batch envelope
    assert 0 < stats["files_rewritten"] <= 4
    tbl = read_table(spark, t)
    assert tbl.where("k = 5").first()["v"] == "LOW5"
    assert tbl.count() == 2000
    # untouched high files carried over verbatim (same paths in manifest)
    before = {e.path for e in _read_manifest(spark, t, 1)}
    after = {e.path for e in _read_manifest(spark, t, 2)}
    assert len(before & after) == n_files - stats["files_rewritten"]


def test_merge_empty_batch_noop(spark, tmp_path):
    t = str(tmp_path / "t8")
    write_table(_df(spark, [(1, "a")]), t, ["k"])
    stats = merge_upsert(spark, t, _df(spark, []), ["k"])
    assert stats == {"version": 0, "files_total": 1, "files_rewritten": 0}


def test_time_travel_by_version_and_timestamp(spark, tmp_path):
    t = str(tmp_path / "tt")
    write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    merge_upsert(spark, t, _df(spark, [(2, "B2"), (3, "c")]), ["k"])

    v0 = {(r["k"], r["v"]) for r in read_table(spark, t, version=0).collect()}
    v1 = {(r["k"], r["v"]) for r in read_table(spark, t).collect()}
    assert v0 == {(1, "a"), (2, "b")}
    assert v1 == {(1, "a"), (2, "B2"), (3, "c")}

    # commit time = manifest mtime: far future resolves to the newest
    # version, before-the-epoch resolves to nothing
    far_future = 4_000_000_000_000
    assert version_as_of(spark, t, far_future) == 1
    assert version_as_of(spark, t, 0) is None
    as_of = {
        (r["k"], r["v"])
        for r in read_table(spark, t, as_of_ms=far_future).collect()
    }
    assert as_of == v1


def test_snapshots_history(spark, tmp_path):
    t = str(tmp_path / "hist")
    write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    write_table(_df(spark, [(3, "c")]), t, ["k"], mode="append")
    hist = snapshots(spark, t)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["n_rows"] == 2
    assert hist[1]["n_rows"] == 3
    assert hist[1]["n_files"] > hist[0]["n_files"] or hist[1]["n_files"] >= 1
    assert all(h["committed_at_ms"] > 0 for h in hist)


def test_change_feed_net_effect(spark, tmp_path):
    t = str(tmp_path / "cf")
    write_table(
        _df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]), t, ["k"]
    )
    changes = spark.createDataFrame(
        # update k=2, delete k=3, re-write k=4 with the SAME value
        # (carried-over rows must not appear in the feed), insert k=9
        [(2, "B2", False), (3, None, True), (4, "d", False), (9, "i", False)],
        "k long, v string, is_del boolean",
    )
    merge_upsert(spark, t, changes, ["k"], delete_col="is_del")

    feed = change_feed(spark, t, 0, 1, ["k"])
    got = {
        (r["__change_type"], r["k"], r["v"]) for r in feed.collect()
    }
    assert got == {
        ("update_preimage", 2, "b"),
        ("update_postimage", 2, "B2"),
        ("delete", 3, "c"),
        ("insert", 9, "i"),
    }
    assert feed.select("__commit_version").distinct().first()[0] == 1


def test_change_feed_skips_files_common_to_both_versions(spark, tmp_path):
    """Files carried over between versions are excluded from the diff on
    both sides — the feed's scan is proportional to the change, not the
    table."""
    t = str(tmp_path / "cfprune")
    low = spark.range(0, 500).select(
        F.col("id").alias("k"), F.lit("low").alias("v")
    ).repartition(3)
    high = spark.range(100_000, 100_500).select(
        F.col("id").alias("k"), F.lit("high").alias("v")
    ).repartition(3)
    write_table(low, t, ["k"])
    write_table(high, t, ["k"], mode="append")
    merge_upsert(spark, t, _df(spark, [(7, "LOW7")]), ["k"])

    feed = change_feed(spark, t, 1, 2, ["k"])
    got = {(r["__change_type"], r["k"], r["v"]) for r in feed.collect()}
    assert got == {
        ("update_preimage", 7, "low"),
        ("update_postimage", 7, "LOW7"),
    }
    # structural pruning: every high-range file carried over between v1 and
    # v2 (same path in both manifests), so the diff excludes it by
    # construction — only rewritten low files and their replacements are read
    m1 = {e.path for e in _read_manifest(spark, t, 1)}
    m2 = {e.path for e in _read_manifest(spark, t, 2)}
    high_paths = {
        e.path
        for e in _read_manifest(spark, t, 1)
        if e.key_min["k"] >= 100_000
    }
    assert high_paths and high_paths <= (m1 & m2)


def test_vacuum_drops_unreferenced_files_keeps_current(spark, tmp_path):
    t = str(tmp_path / "vac")
    write_table(_df(spark, [(1, "a"), (2, "b")]), t, ["k"])
    merge_upsert(spark, t, _df(spark, [(2, "B2")]), ["k"])
    merge_upsert(spark, t, _df(spark, [(1, "A2")]), ["k"])

    stats = vacuum(spark, t, keep_last=1)
    assert stats["versions_kept"] == [2]
    assert stats["manifests_removed"] == 2
    assert stats["data_files_removed"] > 0

    got = {(r["k"], r["v"]) for r in read_table(spark, t).collect()}
    assert got == {(1, "A2"), (2, "B2")}
    with pytest.raises(FileNotFoundError):
        read_table(spark, t, version=0)


def test_concurrent_commit_conflict_and_retry(spark, tmp_path):
    """Two writers racing for the same version: the loser gets
    CommitConflict with NO partial state published, and a retry on the
    fresh snapshot succeeds with both changes present."""
    import pytest as _pytest

    from cdc_application_febuary_spark.sources import manifest_table as _mt

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    _mt.write_table(base, t, ["k"])

    # writer A commits v1 first
    _mt.merge_upsert(
        spark, t, spark.createDataFrame([(1, "a2")], "k long, v string"), ["k"]
    )
    # writer B planned against v0 and tries to publish v1 directly
    entries = _mt._read_manifest(spark, t, 0)
    with _pytest.raises(_mt.CommitConflict):
        _mt._write_manifest_atomic(spark, t, 1, entries)

    # nothing about B leaked; A's commit intact
    assert _mt.current_version(spark, t) == 1
    assert _mt.read_table(spark, t).where("k = 1").first()["v"] == "a2"

    # B retries on the fresh snapshot — the standard optimistic loop
    stats = _mt.merge_upsert(
        spark, t, spark.createDataFrame([(3, "c")], "k long, v string"), ["k"]
    )
    assert stats["version"] == 2
    rows = {r["k"]: r["v"] for r in _mt.read_table(spark, t).collect()}
    assert rows == {1: "a2", 2: "b", 3: "c"}


def test_delete_where_rewrites_only_matching_files(spark, tmp_path):
    """Predicate DELETE: files without matches carry over untouched; the
    audit trail records the predicate; old versions still see the rows."""
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.sources import manifest_table as mt

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartitionByRange(10, "k")
    mt.write_table(df, t, ["k"])

    stats = mt.delete_where(spark, t, "k >= 900", ["k"])
    assert stats["rows_deleted"] == 100
    assert stats["files_total"] == 10
    # only the tail file(s) contained k>=900
    assert 1 <= stats["files_rewritten"] <= 2
    assert mt.read_table(spark, t).count() == 900
    assert mt.read_table(spark, t).where("k >= 900").count() == 0
    # snapshot isolation: version 0 still has every row
    assert mt.read_table(spark, t, version=0).count() == 1000
    meta = mt.read_commit_meta(spark, t, stats["version"])
    assert meta["operation"] == "delete" and meta["predicate"] == "k >= 900"


def test_delete_where_no_matches_is_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.sources import manifest_table as mt

    t = str(tmp_path / "t")
    mt.write_table(
        spark.range(10).select(F.col("id").alias("k")), t, ["k"]
    )
    stats = mt.delete_where(spark, t, "k > 999", ["k"])
    assert stats["rows_deleted"] == 0 and stats["files_rewritten"] == 0
    assert mt.current_version(spark, t) == 0  # nothing committed


def test_delete_where_shows_in_change_feed(spark, tmp_path):
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.sources import manifest_table as mt

    t = str(tmp_path / "t")
    mt.write_table(
        spark.range(20).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        t, ["k"],
    )
    mt.delete_where(spark, t, "k < 5", ["k"])
    feed = mt.change_feed(spark, t, 0, 1, ["k"])
    dels = feed.where(F.col(mt.CHANGE_TYPE) == "delete")
    assert sorted(r["k"] for r in dels.collect()) == [0, 1, 2, 3, 4]


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE removes only predicate-TRUE rows: a row where the
    predicate evaluates NULL (NULL email vs `email = 'x'`) must be KEPT —
    in rewritten files exactly as in untouched ones (ADVICE r3: `~pred`
    is NULL for those rows and silently dropped them from rewrites)."""
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.sources import manifest_table as mt

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, "a@x.com"), (1, None), (2, "purge@x.com"), (3, None),
         (4, "b@x.com")],
        "k long, email string",
    ).repartitionByRange(2, "k")  # NULL rows share files with the match
    mt.write_table(df, t, ["k"])

    stats = mt.delete_where(spark, t, "email = 'purge@x.com'", ["k"])
    assert stats["rows_deleted"] == 1
    left = mt.read_table(spark, t)
    assert left.count() == 4  # both NULL-email rows survived
    assert sorted(r["k"] for r in left.collect()) == [0, 1, 3, 4]
    assert left.where(F.col("email").isNull()).count() == 2


def test_append_widens_column_type_losslessly(spark, tmp_path):
    """Type widening on append (round-4, mirroring the JDBC auto-DDL
    lattice): an int column upgraded to bigint by a later batch evolves
    the LOG schema; files written before the widening upcast on read
    (Spark 4 parquet scan widening), so old rows and the int32-overflow
    row coexist."""
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.sources import manifest_table as mt

    t = str(tmp_path / "t")
    mt.write_table(
        spark.createDataFrame([(0, 10), (1, 20)], "k long, v int"), t, ["k"]
    )
    big = 3_000_000_000
    mt.write_table(
        spark.createDataFrame([(2, big)], "k long, v long"),
        t, ["k"], mode="append",
    )
    out = mt.read_table(spark, t)
    assert dict(out.dtypes)["v"] == "bigint"
    assert {(r["k"], r["v"]) for r in out.collect()} == {
        (0, 10), (1, 20), (2, big)
    }
    # a narrower batch after the widening is fine: pinned schema upcasts
    mt.write_table(
        spark.createDataFrame([(3, 30)], "k long, v int"),
        t, ["k"], mode="append",
    )
    out = mt.read_table(spark, t)
    assert dict(out.dtypes)["v"] == "bigint"
    assert out.count() == 4
    # lossy change still raises
    import pytest

    with pytest.raises(ValueError, match="not a lossless widening"):
        mt.write_table(
            spark.createDataFrame([(4, "x")], "k long, v string"),
            t, ["k"], mode="append",
        )
