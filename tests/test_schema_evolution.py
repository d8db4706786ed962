"""Schema evolution on manifest tables: log-tracked schemas, widening
appends, NULL-backfilled reads of pre-evolution files, evolving MERGE."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.sources import manifest_table as mt


def _v1(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))


def _v2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("a"),
        F.concat(F.lit("x"), F.col("id")).alias("b"),
    )


def test_append_widens_schema_and_backfills_nulls(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_v1(spark, 0, 10), t, ["k"])
    mt.write_table(_v2(spark, 10, 15), t, ["k"], mode="append")

    df = mt.read_table(spark, t)
    assert df.columns == ["k", "a", "b"]
    assert df.count() == 15
    # pre-evolution rows read back with NULL b; new rows carry values
    assert df.where(F.col("k") < 10).where(F.col("b").isNotNull()).count() == 0
    assert df.where(F.col("k") >= 10).where(F.col("b").isNull()).count() == 0

    # time travel to v0 sees the ORIGINAL two-column schema
    v0 = mt.read_table(spark, t, version=0)
    assert v0.columns == ["k", "a"]


def test_append_type_conflict_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_v1(spark, 0, 5), t, ["k"])
    bad = spark.range(5, 8).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("a")
    )
    with pytest.raises(ValueError, match="schema conflict"):
        mt.write_table(bad, t, ["k"], mode="append")


def test_overwrite_resets_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_v2(spark, 0, 5), t, ["k"])
    mt.write_table(_v1(spark, 0, 5), t, ["k"], mode="overwrite")
    assert mt.read_table(spark, t).columns == ["k", "a"]


def test_merge_upsert_evolves_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_v1(spark, 0, 10), t, ["k"])
    changes = _v2(spark, 5, 12)  # overlaps keys 5-9, adds column b
    mt.merge_upsert(spark, t, changes, ["k"])

    df = mt.read_table(spark, t)
    assert set(df.columns) == {"k", "a", "b"}
    assert df.count() == 12
    got = {r["k"]: r["b"] for r in df.collect()}
    assert got[7] == "x7" and got[11] == "x11"
    assert all(got[k] is None for k in range(0, 5))


def test_clone_carries_schema(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    mt.write_table(_v1(spark, 0, 10), src, ["k"])
    mt.write_table(_v2(spark, 10, 12), src, ["k"], mode="append")
    mt.shallow_clone(spark, src, dst)
    assert mt.read_table(spark, dst).columns == ["k", "a", "b"]


def test_optimize_preserves_evolved_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    mt.write_table(_v1(spark, 0, 10), t, ["k"])
    mt.write_table(_v2(spark, 10, 15), t, ["k"], mode="append")
    mt.optimize_table(spark, t, ["k"])
    df = mt.read_table(spark, t)
    assert df.columns == ["k", "a", "b"]
    assert df.count() == 15
    # rows that predate the column survived the rewrite with NULLs intact
    assert df.where((F.col("k") < 10) & F.col("b").isNotNull()).count() == 0


def test_streaming_restart_with_drifted_source_widens_target(spark, tmp_path):
    """The CDC schema-drift story end-to-end: a source adds a column, the
    stream restarts (Debezium semantics — schema changes arrive across
    restarts), and the exactly-once sink WIDENS the target instead of
    failing or forking a new table. Pre-drift rows read back with NULLs;
    replayed batch ids are still dropped whole."""
    from cdc_application_febuary_spark.streaming import manifest_sink as ms

    t = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "a")], "k long, payload string")
    assert ms.append_batch(b0, 0, t, ["k"]) == 0

    # restart: source schema drifted — a new `region` column appears
    b1 = spark.createDataFrame(
        [(2, "b", "eu")], "k long, payload string, region string"
    )
    assert ms.append_batch(b1, 1, t, ["k"]) == 1

    df = mt.read_table(spark, t)
    assert df.columns == ["k", "payload", "region"]
    got = {r["k"]: r["region"] for r in df.collect()}
    assert got == {1: None, 2: "eu"}

    # crash replay of the drifted batch: dropped whole, schema unchanged
    assert ms.append_batch(b1, 1, t, ["k"]) is None
    assert mt.read_table(spark, t).count() == 2


def test_change_feed_column_stats_attribution(spark, tmp_path):
    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    mt.write_table(base, t, ["k"])
    chg = spark.createDataFrame(
        [(1, "a", 11, False),   # v changed, s unchanged
         (2, "B", 20, False),   # s changed, v unchanged
         (3, None, None, True), # delete
         (9, "new", 90, False)],  # insert
        "k long, s string, v long, is_del boolean",
    )
    mt.merge_upsert(spark, t, chg, ["k"], delete_col="is_del")
    got = {
        r["metric"]: r["cnt"]
        for r in mt.change_feed_column_stats(spark, t, 0, 1, ["k"]).collect()
    }
    assert got == {
        "deleted": 1, "inserted": 1, "updated": 2,
        "updated:s": 1, "updated:v": 1,
    }


def test_change_feed_sees_new_column_only_updates(spark, tmp_path):
    """Post-evolution change feed: an update that ONLY touches the evolved
    column must surface (the feed reads both sides under the widened log
    schema — inferring from pre-evolution files would hide it)."""
    t = str(tmp_path / "t")
    mt.write_table(_v1(spark, 0, 6), t, ["k"])  # columns (k, a)
    chg = spark.createDataFrame(
        [(3, 6, "x3")], "k long, a long, b string"  # a unchanged for k=3
    )
    mt.merge_upsert(spark, t, chg, ["k"])

    feed = mt.change_feed(spark, t, 0, 1, ["k"]).collect()
    types = {r["__change_type"] for r in feed if r["k"] == 3}
    assert types == {"update_preimage", "update_postimage"}
    post = [r for r in feed if r["k"] == 3 and r["__change_type"] == "update_postimage"]
    assert post[0]["b"] == "x3"

    got = {
        r["metric"]: r["cnt"]
        for r in mt.change_feed_column_stats(spark, t, 0, 1, ["k"]).collect()
    }
    assert got["updated:b"] == 1 and got["updated:a"] == 0
