"""SemDeDup (`operators/dedup.py:semantic_dedup`): planted-duplicate
semantics, the paper's keep-the-edge-example rule, and full numpy parity
against an independent reference implementation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.dedup import semantic_dedup


def _df_from_vecs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_planted_duplicates_are_dropped_keep_edge_example(spark):
    """Three well-separated directions; each gets one near-copy. Exactly
    one member of each planted pair survives, and it is the member with
    the LOWER cosine to the cluster centroid (the paper's rule)."""
    rng = np.random.RandomState(7)
    base = np.eye(8)[:3]  # three orthogonal anchors
    vecs, pair_of = [], {}
    for b in base:
        i = len(vecs)
        vecs.append(b + 0.01 * rng.randn(8))
        vecs.append(vecs[i] + 0.001 * rng.randn(8))  # cosine ~0.99997
        pair_of[i] = i + 1
    # singletons near each anchor but below threshold vs the pair
    for b in base:
        vecs.append(0.6 * b + 0.8 * rng.randn(8))
    out = semantic_dedup(
        _df_from_vecs(spark, vecs),
        n_clusters=3,
        threshold=0.99,
        seed=1,
    ).collect()
    rows = {r["id"]: r for r in out}
    assert len(rows) == len(vecs)
    for a, b in pair_of.items():
        ra, rb = rows[a], rows[b]
        assert ra["grp"] == rb["grp"] == min(a, b)
        assert ra["grp_size"] == rb["grp_size"] == 2
        assert ra["keep"] != rb["keep"], "exactly one of the pair survives"
        kept = ra if ra["keep"] else rb
        drop = rb if ra["keep"] else ra
        assert kept["cos_centroid"] <= drop["cos_centroid"]
    # every cluster keeps exactly one row per group
    for r in out:
        if r["grp_size"] == 1:
            assert r["keep"]


def _numpy_semdedup(vecs, centers, threshold):
    """Independent reference: assign -> per-cluster pairwise -> union-find
    -> keep lowest-centroid-cosine per group."""
    M = np.asarray(vecs, dtype="float64")
    Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)
    assign = (Mn @ centers.T).argmax(axis=1)
    keep = np.ones(len(M), dtype=bool)
    grp = np.arange(len(M))
    for c in np.unique(assign):
        idx = np.nonzero(assign == c)[0]  # ascending ids
        sub = Mn[idx]
        sims = sub @ sub.T
        parent = dict(zip(idx, idx))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                if sims[ai, bi] >= threshold:
                    ra, rb = find(idx[ai]), find(idx[bi])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = {}
        for i in idx:
            roots.setdefault(find(i), []).append(i)
        cos_c = sub @ centers[c]
        pos = {v: k for k, v in enumerate(idx)}
        for r, members in roots.items():
            for m in members:
                grp[m] = r
            if len(members) > 1:
                keeper = min(
                    members, key=lambda m: (cos_c[pos[m]], m)
                )
                for m in members:
                    keep[m] = m == keeper
    return assign, grp, keep


def test_numpy_parity_on_fixture_embeddings(spark, sf_dir):
    """Operator output == the independent numpy reference on the fixture
    corpus, sharing only the trained centroids (same bounded-sample
    k-means both engines use)."""
    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.operators.similarity import (
        _kmeans_sample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    assert ids == sorted(ids) and ids[0] == 0 and len(ids) == len(set(ids))
    vecs = [r["embedding"] for r in rows]
    # the operator trains on the max_train lowest ids in id order
    sample = vecs[:4096]
    centers = np.asarray(_kmeans_sample(sample, 8, 8, 42), dtype="float64")
    a_ref, grp_ref, keep_ref = _numpy_semdedup(vecs, centers, 0.45)
    got = {
        r["id"]: r
        for r in semantic_dedup(
            emb, n_clusters=8, threshold=0.45, seed=42
        ).collect()
    }
    assert len(got) == len(ids)
    mismatches = [
        i
        for i in ids
        if (
            got[i]["cluster"] != a_ref[i]
            or got[i]["grp"] != grp_ref[i]
            or got[i]["keep"] != bool(keep_ref[i])
        )
    ]
    assert mismatches == []


def test_groups_never_span_clusters(spark, sf_dir):
    from cdc_application_febuary_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    flags = semantic_dedup(emb, n_clusters=8, threshold=0.45, seed=42)
    spans = (
        flags.groupBy("grp")
        .agg(
            F.countDistinct("cluster").alias("nc"),
            F.sum(F.col("keep").cast("int")).alias("keepers"),
            F.count(F.lit(1)).alias("n"),
        )
        .where((F.col("nc") > 1) | (F.col("keepers") != 1))
        .count()
    )
    assert spans == 0


def test_partitioning_invariant(spark, sf_dir):
    """Same flags regardless of input partitioning: assignment is a pure
    function of (vector, centroids) and pruning is per-cluster."""
    from cdc_application_febuary_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    key = lambda rows: sorted(
        (r["id"], r["cluster"], r["grp"], r["keep"]) for r in rows
    )
    a = key(semantic_dedup(emb, n_clusters=8, threshold=0.45).collect())
    b = key(
        semantic_dedup(
            emb.repartition(11, "vec_id"), n_clusters=8, threshold=0.45
        ).collect()
    )
    assert a == b


def test_srp_semantic_dedup_planted_pair(spark):
    """Portable-plane SRP tier: a near-identical pair shares every sign
    bit (same bucket), dedups to the min id; an orthogonal singleton
    keeps itself."""
    from cdc_application_febuary_spark.operators.dedup import (
        srp_semantic_dedup,
    )

    rng = np.random.RandomState(11)
    a = (np.eye(16)[0] + 0.01 * rng.randn(16)).tolist()
    a2 = (np.asarray(a) + 0.0001 * rng.randn(16)).tolist()
    c = (np.eye(16)[5] + 0.01 * rng.randn(16)).tolist()
    df = _df_from_vecs(spark, [a, a2, c])
    got = {r["id"]: r for r in srp_semantic_dedup(df, threshold=0.99).collect()}
    assert got[0]["grp"] == got[1]["grp"] == 0
    assert got[0]["keep"] and not got[1]["keep"]
    assert got[2]["grp"] == 2 and got[2]["keep"]


def test_lsh_topk_portable_recall_matches_srp_theory(spark, sf_dir):
    """Single-table SRP recall is predictable: a pair at angle theta
    shares all sign bits with probability (1 - theta/pi)^planes. The
    measured recall@5 of the portable-plane LSH must sit within ±0.1 of
    the prediction averaged over the TRUE top-5 pairs — the honest
    statement of the approximate tier's trade (the value oracle pins
    WHAT it returns; this pins that the recall is the theoretical one,
    not an implementation accident)."""
    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.operators.similarity import (
        cosine_topk,
        lsh_topk_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 10 == 0)
    qq = q.select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, qq, k=5).collect()
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk_portable(emb, q, k=5, planes=4).collect()
    }
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    measured = len(approx & truth) / len(truth)
    predicted = float(
        np.mean(
            [
                (1.0 - np.arccos(np.clip(r["sim"], -1, 1)) / np.pi) ** 4
                for r in exact
            ]
        )
    )
    assert abs(measured - predicted) < 0.1, (measured, predicted)


def test_portable_buckets_bit_exact_vs_python_reference(spark):
    """portable_srp_buckets must equal a from-scratch python reference
    (decimal arithmetic, same weight formula) on arbitrary float32
    vectors — the property the SQL oracles lean on — and be invariant
    to input partitioning (exact DECIMAL sums)."""
    from decimal import Decimal

    from cdc_application_febuary_spark.operators.similarity import (
        portable_srp_buckets,
    )

    rng = np.random.RandomState(23)
    vecs = [np.float32(rng.randn(12)).tolist() for _ in range(40)]
    df = _df_from_vecs(spark, vecs)

    def ref_bucket(v, planes=8):
        b = 0
        for p in range(planes):
            s = Decimal(0)
            for i, e in enumerate(v, start=1):
                w = ((i * 2654435761) + (p + 1) * 40503) % 97 - 48
                s += Decimal(f"{float(np.float32(e)):.6f}") * w
            if s >= 0:
                b |= 1 << p
        return b

    expect = {i: ref_bucket(v) for i, v in enumerate(vecs)}
    got = {
        r["_id"]: r["bucket"]
        for r in portable_srp_buckets(df).collect()
    }
    assert got == expect
    got_rep = {
        r["_id"]: r["bucket"]
        for r in portable_srp_buckets(df.repartition(7)).collect()
    }
    assert got_rep == expect
