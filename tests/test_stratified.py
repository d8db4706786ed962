"""Exact-quota stratified sampling (`operators/sampling.py:
stratified_sample_exact` + `allocate_exact`): allocation invariants,
quota exactness, and partitioning invariance of the drawn set."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.sampling import (
    allocate_exact,
    stratified_sample_exact,
)


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12
    ),
    frac_num=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_allocate_exact_properties(sizes, frac_num):
    items = [(f"s{i}", v) for i, v in enumerate(sizes)]
    n = sum(sizes)
    total = (frac_num * n) // 100
    q = allocate_exact(items, total)
    # exact total, never over-draws a stratum, within 1 of proportional
    assert sum(q.values()) == total
    for k, v in items:
        assert 0 <= q[k] <= v
        exact = total * v / n
        assert abs(q[k] - exact) < 1.0


def test_allocate_exact_deterministic_and_guarded():
    items = [("b", 3), ("a", 3), ("c", 4)]
    assert allocate_exact(sorted(items), 5) == allocate_exact(
        sorted(items), 5
    )
    # remainder tie (b vs a at equal remainders) goes to the smaller key
    q = allocate_exact(sorted(items), 5)
    assert q["a"] >= q["b"] or q["a"] == q["b"]
    with pytest.raises(ValueError):
        allocate_exact(items, 11)  # total > population
    with pytest.raises(ValueError):
        allocate_exact(items, -1)


def test_stratified_sample_exact_quotas_and_invariance(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_sample_exact(df, "grp", "id", 80, seed=3)
    got = {
        (r["grp"], r["id"]): r["__ss_rank"] for r in out.collect()
    }
    assert len(got) == 80
    # per-stratum counts match the exact allocation (67/67/66 -> quotas)
    counts = {"s0": 67, "s1": 67, "s2": 66}
    quotas = allocate_exact(sorted(counts.items()), 80)
    per = {}
    for (g, _i), _r in got.items():
        per[g] = per.get(g, 0) + 1
    assert per == quotas
    # the drawn SET is partitioning-invariant (pure function of id+seed)
    out2 = stratified_sample_exact(
        df.repartition(13, "id"), "grp", "id", 80, seed=3
    )
    got2 = {(r["grp"], r["id"]) for r in out2.collect()}
    assert set(got) == got2
    # a different seed draws a different set (overwhelmingly)
    out3 = stratified_sample_exact(df, "grp", "id", 80, seed=4)
    got3 = {(r["grp"], r["id"]) for r in out3.collect()}
    assert got3 != set(got)
