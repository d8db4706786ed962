"""OPTIMIZE + point lookups on manifest tables: layout changes, rows don't."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import manifest_table as mt


def _df(spark, lo, hi, parts=8):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartition(parts)
    )


def test_optimize_compacts_small_files(spark, tmp_path):
    t = str(tmp_path / "t")
    # three appends of 8 partitions each -> ~24 small files
    for i in range(3):
        mt.write_table(_df(spark, i * 100, (i + 1) * 100), t, ["k"], mode="append")
    before = len(mt._read_manifest(spark, t, mt.current_version(spark, t)))
    assert before >= 12

    stats = mt.optimize_table(spark, t, ["k"], target_files=4)
    assert stats["files_after"] == 4
    assert stats["files_rewritten"] == before

    # rows identical across the rewrite
    assert mt.read_table(spark, t).count() == 300
    got = sorted(r["k"] for r in mt.read_table(spark, t).collect())
    assert got == list(range(300))
    # prior snapshot untouched
    assert len(mt._read_manifest(spark, t, stats["version"] - 1)) == before
    assert mt.read_commit_meta(spark, t, stats["version"])["operation"] == "optimize"


def test_optimize_changefeed_is_empty(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_df(spark, 0, 200), t, ["k"])
    v = mt.optimize_table(spark, t, ["k"], target_files=2)["version"]
    assert mt.change_feed(spark, t, v - 1, v, ["k"]).count() == 0


def test_incremental_optimize_keeps_big_files(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_df(spark, 0, 1000, parts=2), t, ["k"])          # 2 big files
    mt.write_table(_df(spark, 1000, 1016, parts=8), t, ["k"], mode="append")
    before = mt._read_manifest(spark, t, mt.current_version(spark, t))
    big = {e.path for e in before if e.rows > 100}

    stats = mt.optimize_table(spark, t, ["k"], small_file_rows=100, target_files=1)
    after = mt._read_manifest(spark, t, stats["version"])
    # the big files carried over by identity; small ones packed into 1
    assert big <= {e.path for e in after}
    assert len(after) == len(big) + 1
    assert mt.read_table(spark, t).count() == 1016


def test_optimize_noop_when_nothing_to_pack(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_df(spark, 0, 50, parts=1), t, ["k"])
    stats = mt.optimize_table(spark, t, ["k"], small_file_rows=1000)
    assert stats["files_rewritten"] == 0
    assert stats["version"] == 0  # no new commit for a no-op


def test_lookup_prunes_files_by_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    # range-partitioned write -> disjoint key envelopes per file
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartitionByRange(10, "k")
    mt.write_table(df, t, ["k"])
    entries = mt._read_manifest(spark, t, 0)

    hits = mt.lookup_keys(spark, t, ["k"], [{"k": 5}, {"k": 873}])
    rows = {r["k"]: r["v"] for r in hits.collect()}
    assert rows == {5: 5, 873: 873 % 7}

    # the candidate set was pruned: only files whose envelope covers 5/873
    cands = [
        e for e in entries
        if any(e.key_min["k"] <= x <= e.key_max["k"] for x in (5, 873))
    ]
    assert len(cands) < len(entries)


def test_lookup_missing_key_returns_empty(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_df(spark, 0, 100), t, ["k"])
    assert mt.lookup_keys(spark, t, ["k"], [{"k": 10_000}]).count() == 0
