"""Similarity search: exact top-k on vectors with known cosines; SRP-LSH
bucket behavior."""

import math

from cdc_application_febuary_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
)


def _corpus(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_ordering(spark):
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = cosine_topk(corpus, queries, k=4).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 4, 2, 3]
    assert math.isclose(out[0]["sim"], 0.9 / math.sqrt(0.82), rel_tol=1e-5)
    assert out[2]["sim"] == 0.0 and out[3]["sim"] == -1.0
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_cosine_topk_excludes_self(spark):
    corpus = _corpus(spark)
    queries = corpus.selectExpr("vec_id AS query_id", "embedding")
    out = cosine_topk(corpus, queries, k=10).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_lsh_topk_subset_of_exact_sims(spark):
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact = {
        r["neighbor_id"]: r["sim"]
        for r in cosine_topk(corpus, queries, k=10).collect()
    }
    approx = lsh_topk(corpus, queries, k=10, dim=4, planes=2).collect()
    # LSH returns a subset of true neighbors with identical sims
    for r in approx:
        assert r["neighbor_id"] in exact
        assert abs(r["sim"] - exact[r["neighbor_id"]]) < 1e-9
    # identical vectors always share a bucket with themselves -> the near
    # neighbor (same orthant) must be found
    assert any(r["neighbor_id"] == 1 for r in approx)


def test_lsh_multiprobe_widens_candidates(spark):
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    base = {
        r["neighbor_id"]
        for r in lsh_topk(corpus, queries, k=10, dim=4, planes=2).collect()
    }
    probed = {
        r["neighbor_id"]
        for r in lsh_topk(
            corpus, queries, k=10, dim=4, planes=2, probes=1
        ).collect()
    }
    assert base <= probed  # probing only adds candidates
    assert len(probed) >= len(base)
    exact = {
        r["neighbor_id"]: r["sim"]
        for r in cosine_topk(corpus, queries, k=10).collect()
    }
    for r in lsh_topk(corpus, queries, k=10, dim=4, planes=2, probes=1).collect():
        assert abs(r["sim"] - exact[r["neighbor_id"]]) < 1e-9
