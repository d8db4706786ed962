"""Sequence packing: next-fit semantics, budget invariants, determinism."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_next_fit_walk(spark):
    # tokens: 3, 3, 2, 5 with budget 6 -> bins [0, 0, 1, 2]
    docs = _docs(
        spark,
        [
            (1, "s", "a b c"),
            (2, "s", "d e f"),
            (3, "s", "g h"),
            (4, "s", "i j k l m"),
        ],
    )
    got = {
        r["id"]: r["bin_id"]
        for r in packing.pack_documents(docs, budget=6).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 2}


def test_budget_respected_except_oversized(spark):
    docs = _docs(
        spark,
        [(i, f"s{i % 3}", "w " * (5 + i * 3)) for i in range(40)],
    )
    packed = packing.pack_documents(docs, budget=64)
    fills = (
        packed.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        # A bin over budget can only be a single oversized document.
        assert r["fill"] <= 64 or r["n"] == 1


def test_oversized_doc_gets_dedicated_bin(spark):
    docs = _docs(
        spark,
        [
            (1, "s", "a b"),
            (2, "s", "x " * 100),  # 100 tokens >> budget
            (3, "s", "c d"),
        ],
    )
    rows = {
        r["id"]: r["bin_id"]
        for r in packing.pack_documents(docs, budget=10).collect()
    }
    assert rows == {1: 0, 2: 1, 3: 2}


def test_shards_pack_independently(spark):
    docs = _docs(
        spark,
        [(1, "a", "x y z"), (2, "b", "x y z"), (3, "a", "x " * 200)],
    )
    rows = packing.pack_documents(docs, budget=5).collect()
    by_shard = {(r["shard"], r["id"]): r["bin_id"] for r in rows}
    assert by_shard[("a", 1)] == 0
    assert by_shard[("b", 2)] == 0  # unaffected by shard a's contents
    assert by_shard[("a", 3)] == 1


def test_deterministic_under_repartition(spark):
    docs = _docs(
        spark, [(i, f"s{i % 4}", "w " * (3 + (i * 7) % 50)) for i in range(60)]
    )
    a = packing.pack_documents(docs, budget=32).orderBy("shard", "id")
    b = (
        packing.pack_documents(docs.repartition(13), budget=32)
        .orderBy("shard", "id")
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_packing_stats_utilization(spark):
    docs = _docs(spark, [(1, "s", "a b c d"), (2, "s", "e f g h")])
    packed = packing.pack_documents(docs, budget=4)
    stats = packing.packing_stats(packed, budget=4).collect()
    assert len(stats) == 1
    r = stats[0]
    assert r["n_bins"] == 2 and r["total_tokens"] == 8
    assert r["utilization"] == pytest.approx(1.0)


def test_rejects_nonpositive_budget(spark):
    docs = _docs(spark, [(1, "s", "a")])
    with pytest.raises(ValueError):
        packing.pack_documents(docs, budget=0)
