"""Dedup operators on constructed corpora with planted exact and near dups."""

import pytest

from cdc_application_febuary_spark.operators.dedup import (
    drop_exact_dups,
    exact_dup_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash_near_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
OTHER = "completely different words about spark engines and distributed query planning systems"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),            # exact dup of 1 (same text)
        (3, "  " + BASE.upper() + "  "),  # dup after normalization
        (4, NEAR),            # near dup of 1 (1 word differs)
        (5, OTHER),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(docs):
    groups = {r["keep_id"]: r["dup_cnt"] for r in exact_dup_groups(docs).collect()}
    assert groups[1] == 3  # 1, 2, 3 collapse after normalization
    assert groups[4] == 1 and groups[5] == 1


def test_drop_exact_dups(docs):
    kept = sorted(r["doc_id"] for r in drop_exact_dups(docs).collect())
    assert kept == [1, 4, 5]


def test_jaccard_pairs_finds_near_dup(docs):
    pairs = jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # exact dups 1-2 share all shingles (j=1); 1-4/2-4 are near (1 word tail)
    assert (1, 2) in got
    assert (1, 4) in got
    assert all(5 not in p for p in got)
    j = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == 1.0
    assert 0.5 <= j[(1, 4)] < 1.0


def test_minhash_matches_exact_pairs(docs):
    exact = {
        (r["a"], r["b"], r["jaccard"])
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert mh == exact  # verification makes candidates exact; recall holds here


def test_simhash_near_pairs(docs):
    got = {(r["a"], r["b"]) for r in simhash_near_pairs(docs, max_hamming=10).collect()}
    assert (1, 2) in got  # identical token sets -> identical simhash
    assert (3, 5) not in got and (1, 5) not in got


def test_connected_components_union_find(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "a long, b long",
    )
    got = {
        r["node"]: r["component"]
        for r in __import__(
            "cdc_application_febuary_spark.operators.dedup", fromlist=["x"]
        ).connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_distributed_agrees_with_driver(spark):
    """driver_threshold=0 forces label propagation; must equal union-find
    on a randomized graph with chains, cliques, and singleton pairs."""
    import random

    from cdc_application_febuary_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    edges = set()
    for base in range(0, 200, 20):  # 10 chains of length ~10
        for i in range(base, base + 19):
            if rng.random() < 0.8:
                edges.add((i, i + 1))
    for _ in range(40):  # random cross links
        a, b = rng.randrange(200), rng.randrange(200)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "a long, b long")
    via_driver = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    via_lp = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert via_lp == via_driver


def test_dedup_clusters_keep_flags(spark):
    from cdc_application_febuary_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(5, 3), (3, 9), (7, 8)], "a long, b long")
    rows = {r["doc_id"]: (r["cluster"], r["keep"]) for r in dedup_clusters(pairs).collect()}
    assert rows == {3: (3, True), 5: (3, False), 9: (3, False),
                    7: (7, True), 8: (7, False)}


def test_lsh_hot_bucket_cap(spark):
    from cdc_application_febuary_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )

    # 30 docs sharing identical text -> every band bucket holds all 30
    # (435 pairs); two genuinely-near docs with distinct text survive a cap
    rows = [(i, BASE) for i in range(30)] + [(100, OTHER), (101, OTHER + "!")]
    sigs = minhash_signatures(
        spark.createDataFrame(rows, ["doc_id", "text"])
    ).persist()
    uncapped = lsh_candidates(sigs).count()
    assert uncapped >= 435  # the boilerplate clique is all-pairs
    capped = {
        (r["a"], r["b"]) for r in lsh_candidates(sigs, max_bucket=5).collect()
    }
    assert (100, 101) in capped  # small buckets keep their candidates
    assert all(a >= 100 for a, _ in capped)  # the hot clique is pruned
    sigs.unpersist()


def test_duplicated_span_stats(spark):
    from cdc_application_febuary_spark.operators.dedup import (
        duplicated_span_stats,
    )

    shared = "one two three four five six seven eight"  # 8 tokens
    rows = [
        (1, shared + " alpha beta gamma"),
        (2, shared + " delta epsilon zeta"),
        (3, "totally unrelated words go here now ok fine sure yes"),
        (4, "short text"),  # < width tokens: dropped entirely
    ]
    out = {
        r["id"]: r
        for r in duplicated_span_stats(
            spark.createDataFrame(rows, ["doc_id", "text"]), width=8
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    # docs 1/2: 11 tokens -> 4 windows each; only the pure-shared window
    # (positions 1) is identical across docs — later windows differ by tail
    assert out[1]["n_windows"] == 4 and out[2]["n_windows"] == 4
    assert out[1]["dup_windows"] == 1 and out[2]["dup_windows"] == 1
    assert abs(out[1]["dup_frac"] - 0.25) < 1e-12
    assert out[3]["dup_windows"] == 0
    # hashed and string keys agree on the statistics
    s2 = {
        r["id"]: (r["n_windows"], r["dup_windows"])
        for r in duplicated_span_stats(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            width=8,
            hashed=False,
        ).collect()
    }
    assert s2 == {
        k: (v["n_windows"], v["dup_windows"]) for k, v in out.items()
    }


def test_simhash_portable_pairs_planted(spark):
    """Portable-feature simhash: a doc and its near-copy (one token
    changed) land within the hamming budget; a disjoint-vocabulary doc
    pairs with neither."""
    from cdc_application_febuary_spark.operators.dedup import (
        simhash_portable_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [
            (0, base + "alpha"),
            (1, base + "omega"),  # near-copy: one trailing token differs
            (2, "zzz yyy xxx www vvv uuu ttt sss rrr qqq " * 5),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_portable_pairs(docs, max_hamming=3).collect()
    }
    assert (0, 1) in got and got[(0, 1)] <= 3
    assert not any(2 in p for p in got), got
