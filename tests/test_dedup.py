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
