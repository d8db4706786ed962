"""HLL sketch operators: merge exactness, estimate accuracy, plan shape."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import sketches


@pytest.fixture(scope="module")
def values(spark):
    # 10k rows, 2k distinct user ids spread over 4 shards (overlapping ids
    # across shards, so the global distinct < sum of per-shard distincts).
    return (
        spark.range(10_000)
        .select(
            (F.col("id") % 2000).alias("uid"),
            F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("shard"),
        )
        .persist()
    )


def test_merged_estimate_equals_single_pass(spark, values):
    """Union of per-shard sketches must equal one global sketch exactly —
    HLL union is lossless over registers at equal lg_k."""
    sk = sketches.shard_sketches(values, "uid", "shard", lg_k=12)
    merged = sketches.merge_estimate(sk).first()["distinct_estimate"]
    single = values.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12)))
    ).first()[0]
    assert merged == single


def test_estimate_within_hll_error(spark, values):
    est = sketches.merge_estimate(
        sketches.shard_sketches(values, "uid", "shard")
    ).first()["distinct_estimate"]
    assert est == pytest.approx(2000, rel=0.05)


def test_rollup_row_present_and_consistent(spark, values):
    rows = {
        r["shard"]: r["distinct_estimate"]
        for r in sketches.distinct_by_shard(values, "uid", "shard").collect()
    }
    assert set(rows) == {"s0", "s1", "s2", "s3", "<all>"}
    # every shard holds ids k*4+i in [0,2000) -> 500 distinct each
    for s in ("s0", "s1", "s2", "s3"):
        assert rows[s] == pytest.approx(500, rel=0.05)
    assert rows["<all>"] == pytest.approx(2000, rel=0.05)
    assert rows["<all>"] < sum(v for k, v in rows.items() if k != "<all>")


def test_shuffle_carries_blobs_not_values(spark, values):
    """The merge aggregates over one row per shard — the exchanged payload
    is sketch blobs, pinned by the union-agg operating on shard_sketches
    output (4 rows) rather than the 10k-row input."""
    sk = sketches.shard_sketches(values, "uid", "shard")
    assert sk.count() == 4
    plan = (
        sketches.merge_estimate(sk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hll_union_agg" in plan


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    """Count-min guarantees est >= true always; with depth 4 x width 256
    over the fixture's event users the overestimate stays far below the
    eps*N bound."""
    from cdc_application_febuary_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    sk = sketches.cms_shard_sketches(
        ev, "user_id", "event_type", depth=4, width=256
    )
    merged = sketches.cms_merge(sk)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.cms_estimate(truth, merged, "user_id").collect()
    n_total = ev.count()
    assert est, "no estimates"
    for r in est:
        assert r["cms_est"] >= r["true_cnt"], r
        # e/width * N, the standard eps bound
        assert r["cms_est"] - r["true_cnt"] <= (2.72 / 256) * n_total, r


def test_cms_shard_merge_equals_global_build(spark, sf_dir):
    """Element-wise merging per-type sketches must equal one global
    sketch bit-for-bit — counters are exact, sharding loses nothing."""
    from cdc_application_febuary_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    merged = sketches.cms_merge(
        sketches.cms_shard_sketches(ev, "user_id", "event_type")
    ).first()["cms"]
    single = sketches.cms_merge(
        sketches.cms_shard_sketches(
            ev.withColumn("one", F.lit("g")), "user_id", "one"
        )
    ).first()["cms"]
    assert merged == single
    assert sum(merged) == 4 * ev.count()  # every row lands in all 4 rows


def test_cms_md5_tier_matches_python_reference(spark):
    """The portable bucket is md5's leading 32 bits of "<v>:<r>" mod
    width — the exact contract the cms_user_counts oracle replays; the
    never-underestimate guarantee is hash-independent."""
    import hashlib

    vals = [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(vals, "v long").withColumn(
        "shard", F.lit("s")
    )
    merged = sketches.cms_merge(
        sketches.cms_shard_sketches(df, "v", "shard", hash="md5")
    )
    cms = merged.first()["cms"]
    truth = df.groupBy("v").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(truth, merged, "v", hash="md5").collect()
    }

    def bucket(v, r):
        return int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:8], 16) % 256

    # reference counters
    ref = [0] * (4 * 256)
    for (v,) in vals:
        for r in range(4):
            ref[r * 256 + bucket(v, r)] += 1
    assert list(cms) == ref
    for v in {x for (x,) in vals}:
        ref_est = min(ref[r * 256 + bucket(v, r)] for r in range(4))
        assert est[v] == ref_est
        assert est[v] >= sum(1 for (x,) in vals if x == v)


def test_cms_rejects_unknown_hash(spark):
    df = spark.createDataFrame([(1,)], "v long").withColumn("shard", F.lit("s"))
    import pytest

    with pytest.raises(ValueError):
        sketches.cms_shard_sketches(df, "v", "shard", hash="sha9")
