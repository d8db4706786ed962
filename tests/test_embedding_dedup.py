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
