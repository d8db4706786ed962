"""Physical-plan quality gates: pushdown, pruning, join strategy, partial
aggregation, limit handling. These are the properties that decide whether a
query survives a 100x scale-up — codified so a refactor that silently
drops one fails CI."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.queries import declared


def _physical(spark, sf_dir, name):
    df = declared.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_no_global_sort(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q1")
    # raw-nanos predicate reaches parquet (row-group pruning at scale)
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
    # limit+order = top-k, not a full sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q4_partial_aggregation(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q4")
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_q7_single_scan_pruned(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q7")
    # the whole profiling battery runs in ONE scan of 4 columns
    assert plan.count("FileScan parquet") == 1
    scan_line = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    for col in ("l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in scan_line
    assert "l_quantity" not in scan_line  # unused columns never read


def test_q9_broadcasts_dimension(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q9")
    assert "BroadcastHashJoin" in plan  # fact table never shuffles
    assert "SortMergeJoin" not in plan


def test_q19_range_join_not_nested_loop(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q19")
    # equi key drives the join; the range predicate rides along
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q11_anti_join_strategy(spark, sf_dir):
    plan = _physical(spark, sf_dir, "q11")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Co-located joins via bucketing: both fact tables bucketed on the join
    key join WITHOUT an Exchange — the layout strategy that makes repeated
    fact-fact joins affordable at 100 TB (shuffle once at write time, never
    again at read time)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{tmp_path}'")
    # at test scale Spark would broadcast instead; disable so the plan shows
    # the co-located sort-merge path a fact-fact join takes at 100 TB
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(f"bucketdemo.{name}_b")
            )
        joined = (
            spark.table("bucketdemo.lineitem_b")
            .join(
                spark.table("bucketdemo.orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # no shuffle below the join: bucketing pre-co-located both sides
        assert "Exchange hashpartitioning" not in join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


@pytest.mark.parametrize("name", ["q2", "q6", "q9", "q14"])
def test_whole_stage_codegen_present(spark, sf_dir, name):
    # AQE only materializes the final plan (with codegen stages) after
    # execution — run the query, then inspect.
    df = declared.QUERIES[name](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages render as "*(n)" prefixes in the final adaptive plan
    assert "*(1)" in plan  # expressions stay JVM-compiled
    assert "isFinalPlan=true" in plan


def test_tpch_q8_star_join_broadcasts_all_dimensions(spark, sf_dir):
    """The 7-table market-share star: every dimension join (part,
    customer-side nation/region, supplier, supplier-side nation) must be
    a broadcast hash join — only lineitem/orders may shuffle."""
    from cdc_application_febuary_spark.queries import tpch_style

    df = tpch_style.QUERIES["tpch_q8_market_share"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_prep_funnel_single_fingerprint_shuffle(spark, sf_dir):
    """The funnel's only wide exchange should be the fingerprint window
    (plus AQE-inserted reads); no range partitioning, no nested loops."""
    from cdc_application_febuary_spark.queries import pipeline_ops

    df = pipeline_ops.QUERIES["corpus_prep_funnel"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- round-2 operators -----------------------------------------------------

def _physical_ops(spark, sf_dir, name):
    from cdc_application_febuary_spark.queries import pipeline_ops

    df = pipeline_ops.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_no_nested_loop_and_partial_min(spark, sf_dir):
    plan = _physical_ops(spark, sf_dir, "conversion_funnel")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan  # stage mins combine map-side


def test_psi_no_nested_loop(spark, sf_dir):
    plan = _physical_ops(spark, sf_dir, "value_drift_psi")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # histogram combines before the shuffle


def test_packing_single_group_exchange(spark, sf_dir):
    plan = _physical_ops(spark, sf_dir, "pack_documents")
    # one hash exchange on the shard key feeds the Arrow group walk
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # group + final sort shuffle


def test_bigram_counts_combine_map_side(spark, sf_dir):
    plan = _physical_ops(spark, sf_dir, "bigram_merge_candidates")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan  # top-20, not a global sort


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    plan = _physical_ops(spark, sf_dir, "contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
