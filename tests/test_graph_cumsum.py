"""Triangle counting (degree-oriented) and scalable exact cumsum."""

from decimal import Decimal

import pytest

from pyspark.sql import Window, functions as F

from cdc_application_febuary_spark.operators import graph, ranking


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_triangle_stats_known_graph(spark):
    # K4 on {1,2,3,4}: 6 edges, 4 triangles, 12 wedges, transitivity 1.0
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    r = graph.triangle_stats(_edges(spark, k4)).first()
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4, 6, 12, 4,
    )
    assert r["transitivity"] == 1.0


def test_triangle_stats_hub_star_has_no_triangles(spark):
    # star: hub 0 to 50 leaves — wedges but zero triangles
    star = [(0, i) for i in range(1, 51)]
    r = graph.triangle_stats(_edges(spark, star)).first()
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 50 * 49 // 2
    assert r["transitivity"] == 0.0


def test_triangle_stats_matches_naive_on_random_graph(spark):
    import random

    rng = random.Random(3)
    pairs = {
        (a, b)
        for _ in range(300)
        for a, b in [sorted(rng.sample(range(30), 2))]
    }
    e = _edges(spark, sorted(pairs))
    got = graph.triangle_stats(e).first()["n_triangles"]
    es = set(pairs)
    naive = sum(
        1
        for (a, b) in es
        for c in range(30)
        if b < c and (b, c) in es and (a, c) in es
    )
    assert got == naive > 0


def test_cooccurrence_edges_dedup_across_groups(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30)], "g long, i long"
    )
    got = {
        (r["u"], r["v"])
        for r in graph.cooccurrence_edges(df, "g", "i").collect()
    }
    assert got == {(10, 20), (10, 30), (20, 30)}


def test_global_cumsum_matches_window_reference(spark):
    import random

    rng = random.Random(9)
    rows = [(i, Decimal(rng.randint(0, 10_000)) / 100) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v decimal(18,2)")
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["cum"]
        for r in ranking.with_global_cumsum(df, order, "v", "cum").collect()
    }
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("v")
            .over(
                Window.orderBy(*order).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("decimal(38,6)"),
        ).collect()
    }
    assert got == want


def test_global_cumsum_rejects_double(spark):
    df = spark.createDataFrame([(1, 1.5)], "id long, v double")
    with pytest.raises(ValueError):
        ranking.with_global_cumsum(df, ["id"], "v")


def test_pagerank_matches_numpy_power_iteration(spark):
    import random

    import numpy as np

    rng = random.Random(5)
    n = 40
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "src long, dst long")

    iters, d = 12, 0.85
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iterations=iters, damping=d).collect()
    }

    # numpy reference: column-stochastic transition with uniform dangling
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    M = np.zeros((N, N))
    outdeg = {}
    for a, b in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    for a, b in pairs:
        M[idx[b], idx[a]] += 1.0 / outdeg[a]
    r = np.full(N, 1.0 / N)
    dang = np.array([1.0 if v not in outdeg else 0.0 for v in nodes])
    for _ in range(iters):
        r = (1 - d) / N + d * (M @ r + (dang @ r) / N)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_dangling_mass_redistributes(spark):
    # chain a->b->c: c is dangling; ranks must still sum to 1 and
    # monotonically favor downstream nodes
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iterations=20).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[1] > got[0]


def test_pagerank_fixedpoint_matches_python_integer_reference(spark):
    """The fixed-point recurrence is pure integer arithmetic: a 30-line
    Python replay must agree BIT-FOR-BIT (same contract the unrolled SQL
    oracle of pagerank_parts relies on)."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    scale, iters = 10**12, 8
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank_fixedpoint(df, iterations=iters).collect()
    }

    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: scale // n for v in nodes}
    base = (3 * scale) // (20 * n)
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for u, v in edges:
            inflow[v] += r[u] // deg[u]
        flowing = sum(inflow.values())
        dangling = sum(r.values()) - flowing
        share = dangling // n
        r = {v: base + (17 * (share + inflow[v])) // 20 for v in nodes}
    assert got == r


def test_pagerank_fixedpoint_tracks_float_pagerank(spark):
    """At scale=1e12 the quantization is ~1e-12/step — fixed-point ranks
    divided by the scale must match the float tier to ~1e-9."""
    import random

    rnd = random.Random(5)
    edges = list({(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fx = {
        r["node"]: r["rank"] / 1e12
        for r in graph.pagerank_fixedpoint(df, iterations=6).collect()
    }
    fl = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iterations=6).collect()
    }
    assert set(fx) == set(fl)
    for k in fx:
        assert abs(fx[k] - fl[k]) < 1e-8


def test_pagerank_fixedpoint_join_strategy_is_value_invariant(spark):
    """The r9 node-count gate picks broadcast vs shuffle joins; the
    integer ranks must be BIT-IDENTICAL either way (join strategy cannot
    change arithmetic — this pin keeps it that way)."""
    from cdc_application_febuary_spark.operators import graph

    df = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12)
         if a != b and (a * 7 + b) % 3 == 0],
        "src long, dst long",
    )
    via_broadcast = sorted(
        (r["node"], r["rank"])
        for r in graph.pagerank_fixedpoint(df, iterations=5).collect()
    )
    via_shuffle = sorted(
        (r["node"], r["rank"])
        for r in graph.pagerank_fixedpoint(
            df, iterations=5, broadcast_nodes_max=0
        ).collect()
    )
    assert via_broadcast == via_shuffle
