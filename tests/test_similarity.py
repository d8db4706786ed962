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


def test_lsh_multi_table_raises_recall(spark):
    """OR-amplification: with enough independent tables the candidate set
    approaches exact; sims of returned rows always equal the exact scan."""
    from cdc_application_febuary_spark.operators.similarity import (
        cosine_topk_blocked,
    )

    import random

    random.seed(21)
    rows = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 40 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_blocked(corpus, qs, k=5).collect()
    }

    def recall(tables):
        got = {
            (r["query_id"], r["neighbor_id"]): r["sim"]
            for r in lsh_topk(
                corpus, qs, k=5, dim=16, planes=4, probes=1, tables=tables
            ).collect()
        }
        for pair, sim in got.items():
            if pair in exact:
                assert abs(sim - exact[pair]) < 1e-6
        return len(got.keys() & exact.keys()) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.9


def test_blocked_topk_equals_interpreted(spark):
    """The mapInPandas block-matmul path returns exactly the same (rank,
    neighbor, rounded sim) table as the pair-join + expression path,
    including sim ties broken by neighbor id."""
    from cdc_application_febuary_spark.operators.similarity import (
        cosine_topk_blocked,
    )

    import random

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(150)]
    # planted exact tie: 130 and 131 are the same vector, so any query
    # scoring them equally must rank the smaller id first
    tie = [random.gauss(0, 1) for _ in range(8)]
    rows[130] = (130, list(tie))
    rows[131] = (131, list(tie))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 25 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in cosine_topk(corpus, qs, k=7).collect()
    )
    blocked = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in cosine_topk_blocked(corpus, qs, k=7).collect()
    )
    assert blocked == exact


def test_blocked_topk_empty_queries(spark):
    from cdc_application_febuary_spark.operators.similarity import (
        cosine_topk_blocked,
    )

    corpus = _corpus(spark)
    qs = corpus.where("vec_id < 0").selectExpr("vec_id AS query_id", "embedding")
    assert cosine_topk_blocked(corpus, qs, k=3).count() == 0


def test_ivf_probe_all_equals_exact(spark):
    """n_probe >= n_centroids degenerates IVF to exact brute force."""
    from cdc_application_febuary_spark.operators.similarity import ivf_topk

    import random

    random.seed(11)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 30 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(corpus, qs, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(
            corpus, qs, k=5, n_centroids=6, n_probe=6, iters=3
        ).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_recall(spark):
    """Probing half the clusters keeps most true neighbors and every
    returned (neighbor, sim) agrees with the exact scan."""
    from cdc_application_febuary_spark.operators.similarity import ivf_topk

    import random

    random.seed(12)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 20 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    exact_rows = cosine_topk(corpus, qs, k=5).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["sim"] for r in exact_rows
    }
    approx = ivf_topk(corpus, qs, k=5, n_centroids=8, n_probe=4, iters=3).collect()
    found = [r for r in approx if (r["query_id"], r["neighbor_id"]) in exact_pairs]
    assert len(found) / len(exact_rows) >= 0.6
    for r in found:
        assert abs(r["sim"] - exact_sims[(r["query_id"], r["neighbor_id"])]) < 1e-9


def test_ivf_srp_zero_planes_equals_exact(spark):
    """planes=0 => one cell, probe list [0] => the inverted file
    degenerates to exact brute force."""
    from cdc_application_febuary_spark.operators.similarity import ivf_topk_srp

    import random

    random.seed(21)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 30 = 0")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(
            corpus,
            qs.selectExpr("vec_id AS query_id", "embedding"),
            k=5,
        ).collect()
    }
    srp = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_srp(corpus, qs, k=5, planes=0).collect()
    }
    assert srp == exact


def test_ivf_srp_multiprobe_recall_and_agreement(spark):
    """Hamming-1 multiprobe (5/16 cells) keeps most true neighbors on a
    random corpus, and every returned sim agrees with the exact scan."""
    from cdc_application_febuary_spark.operators.similarity import ivf_topk_srp

    import random

    random.seed(22)
    rows = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.where("vec_id % 20 = 0")
    exact_rows = cosine_topk(
        corpus, qs.selectExpr("vec_id AS query_id", "embedding"), k=5
    ).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["sim"] for r in exact_rows
    }
    approx = ivf_topk_srp(corpus, qs, k=5, planes=4).collect()
    found = [
        r for r in approx if (r["query_id"], r["neighbor_id"]) in exact_pairs
    ]
    assert len(found) / len(exact_rows) >= 0.5
    for r in found:
        assert abs(r["sim"] - exact_sims[(r["query_id"], r["neighbor_id"])]) < 1e-9
