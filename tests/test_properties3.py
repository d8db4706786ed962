"""Property-based checks for the round-2 operators: packing, funnels, PSI
drift. Python reference implementations act as executable specifications;
the Spark operator must agree on ANY input, not just the fixtures."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import funnel, packing
from cdc_application_febuary_spark.operators.drift import value_drift

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- packing ---------------------------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1000),  # doc id (deduped below)
        st.integers(min_value=0, max_value=40),    # token count
        st.sampled_from(["s0", "s1", "s2"]),       # shard
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _reference_next_fit(items, budget):
    """items: [(id, tokens)] sorted by id -> {id: bin}."""
    bins, bin_id, fill = {}, 0, 0
    for i, tok in items:
        if fill > 0 and fill + tok > budget:
            bin_id += 1
            fill = 0
        fill += tok
        bins[i] = bin_id
    return bins


@SLOW
@given(docs=docs_strategy, budget=st.integers(min_value=1, max_value=60))
def test_packing_matches_reference_walk(spark, docs, budget):
    rows = [(i, s, "w " * t) for i, t, s in docs]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["shard"], r["id"]): r["bin_id"]
        for r in packing.pack_documents(df, budget=budget).collect()
    }
    for shard in {s for _, _, s in docs}:
        items = sorted((i, t) for i, t, s in docs if s == shard)
        expect = _reference_next_fit(items, budget)
        for i, b in expect.items():
            assert got[(shard, i)] == b


@SLOW
@given(docs=docs_strategy, budget=st.integers(min_value=1, max_value=60))
def test_packing_bins_contiguous_and_monotone(spark, docs, budget):
    rows = [(i, s, "w " * t) for i, t, s in docs]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = packing.pack_documents(df, budget=budget).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["id"], r["bin_id"]))
    for pairs in by_shard.values():
        pairs.sort()
        bins = [b for _, b in pairs]
        assert bins[0] == 0
        for prev, cur in zip(bins, bins[1:]):
            assert cur in (prev, prev + 1)  # no skips, no going back


# --- funnel ----------------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),     # user
        st.sampled_from(["a", "b", "c"]),          # type
        st.integers(min_value=0, max_value=30),    # ts
    ),
    min_size=1,
    max_size=25,
)


def _reference_funnel(rows, stages):
    users = {}
    for u, typ, ts in rows:
        users.setdefault(u, []).append((typ, ts))
    out = {}
    for u, evs in users.items():
        prev, times = None, []
        for stage in stages:
            cand = [
                ts
                for typ, ts in evs
                if typ == stage and (prev is None or ts > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            times.append(prev)
        if times:
            out[u] = times
    return out


@SLOW
@given(rows=events_strategy)
def test_funnel_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    got = {
        r["user"]: [t for t in (r["t1"], r["t2"], r["t3"]) if t is not None]
        for r in funnel.funnel_times(df, ["a", "b", "c"]).collect()
    }
    assert got == _reference_funnel(rows, ["a", "b", "c"])


# --- PSI -------------------------------------------------------------------

values_strategy = st.lists(
    st.floats(min_value=-10, max_value=110, allow_nan=False), min_size=1, max_size=40
)


@SLOW
@given(base=values_strategy, obs=values_strategy)
def test_psi_symmetric_and_nonnegative(spark, base, obs):
    a = spark.createDataFrame([(float(x),) for x in base], "v double")
    b = spark.createDataFrame([(float(x),) for x in obs], "v double")
    ab = value_drift(a, b, "v", 0, 100, 5).agg(F.sum("psi_term")).first()[0]
    ba = value_drift(b, a, "v", 0, 100, 5).agg(F.sum("psi_term")).first()[0]
    # PSI is symmetric in (p, q) by construction and >= 0 (Jensen)
    assert ab == ba
    assert ab >= -1e-9
