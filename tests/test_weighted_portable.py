"""weighted_sample_portable (priority sampling, integer keys): python
md5 reference parity of the exact drawn set, weight monotonicity, and
partitioning invariance."""

import hashlib

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.sampling import (
    weighted_sample_portable,
)


def _py_pick(rows, k, seed):
    def u32(i):
        return int(
            hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16
        )

    keyed = [
        (((w << 44) // (u32(i) + 1)), i) for i, w in rows if w and w > 0
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return {i for _, i in keyed[:k]}


def test_python_reference_parity(spark):
    rows = [(i, (i * 37) % 200 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = {
        r["doc_id"]
        for r in weighted_sample_portable(df, "w", 50, "doc_id", seed=7)
        .select("doc_id")
        .collect()
    }
    assert got == _py_pick(rows, 50, 7)


def test_weight_monotonicity_and_guards(spark):
    # one row with overwhelming weight is always drawn; w<=0/NULL never
    rows = [(0, 500000), (1, 1), (2, 1), (3, 0), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = {
        r["doc_id"]
        for r in weighted_sample_portable(df, "w", 2, "doc_id", seed=3)
        .select("doc_id")
        .collect()
    }
    assert 0 in got and 3 not in got and 4 not in got
    # statistical monotonicity over seeds: heavy id drawn more often
    heavy = sum(
        1
        for s in range(30)
        if 0
        in {
            r["doc_id"]
            for r in weighted_sample_portable(
                spark.createDataFrame(
                    [(0, 50)] + [(i, 1) for i in range(1, 20)],
                    "doc_id long, w int",
                ),
                "w",
                3,
                "doc_id",
                seed=s,
            )
            .select("doc_id")
            .collect()
        }
    )
    assert heavy >= 25  # w=50 vs 19 unit weights, k=3


def test_partitioning_invariance(spark):
    rows = [(i, (i * 13) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    a = {
        r["doc_id"]
        for r in weighted_sample_portable(df, "w", 40, "doc_id", seed=11)
        .collect()
    }
    b = {
        r["doc_id"]
        for r in weighted_sample_portable(
            df.repartition(17), "w", 40, "doc_id", seed=11
        ).collect()
    }
    assert a == b


def test_topk_plan_shape(spark):
    df = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(100)], "doc_id long, w int"
    )
    plan = weighted_sample_portable(
        df, "w", 10, "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weight_boundary_guard(spark):
    """w == 2^19 exactly gives w * 2^44 = 2^63, which overflows signed
    BIGINT — the guard must fire AT the boundary, not just above it
    (ADVICE r6). 2^19 - 1 is the largest admissible weight."""
    import pytest

    bad = spark.createDataFrame(
        [(0, 1 << 19), (1, 1)], "doc_id long, w long"
    )
    with pytest.raises(Exception, match="must be < 2\\^19"):
        weighted_sample_portable(bad, "w", 1, "doc_id").collect()

    ok = spark.createDataFrame(
        [(0, (1 << 19) - 1), (1, 1)], "doc_id long, w long"
    )
    got = weighted_sample_portable(ok, "w", 1, "doc_id").collect()
    assert len(got) == 1
