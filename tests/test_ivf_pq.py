"""IVF-PQ persisted index: build, ADC search, pruning, rerank, pruning of
the embedding column from the ADC scan."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators import vector_index as vi


def _corpus(spark, n=400, d=32, n_clusters=8, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 4
    rows = [
        (
            i,
            [
                float(x)
                for x in centers[i % n_clusters] + rng.normal(size=d) * 0.4
            ],
        )
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        rows,
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    corpus, rows = _corpus(spark)
    stats = vi.build_ivf_pq_index(
        corpus, path, n_centroids=8, pq_m=8, pq_k=16, seed=3
    )
    return path, rows, stats


def _exact_topk(rows, qid, k):
    mat = np.array([v for _, v in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[qid]
    sims = mat @ q
    sims[qid] = -np.inf  # self excluded, as in the index search
    return list(np.argsort(-sims, kind="stable")[:k])


def test_build_commits_self_describing_index(spark, built):
    path, rows, stats = built
    from cdc_application_febuary_spark.sources import manifest_table as mt

    assert stats["code_bytes_per_vector"] == 8
    meta = mt.read_commit_meta(spark, path, stats["version"])
    assert meta["index"] == "ivf_pq"
    assert np.asarray(meta["codebooks"]).shape == (8, 16, 4)
    assert np.asarray(meta["centroids"]).shape == (8, 32)


def test_adc_search_recalls_exact_neighbors(spark, built):
    path, rows, _ = built
    queries = spark.createDataFrame(
        [(qid, rows[qid][1]) for qid in (0, 5, 17)],
        "query_id long, embedding array<float>",
    )
    # ADC codes can't ORDER within a tight cluster (designed resolution
    # limit) but must RETRIEVE it: exact top-10 recalled in ADC top-50
    out = vi.search_ivf_pq(spark, path, queries, k=50, n_probe=8)
    got = {}
    for r in out["result"].collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid in (0, 5, 17):
        exact = set(_exact_topk(rows, qid, 10))
        recall = len(got[qid] & exact) / 10
        assert recall >= 0.9, (qid, recall)


def test_probe_prunes_files(spark, built):
    path, rows, _ = built
    queries = spark.createDataFrame(
        [(0, rows[0][1])], "query_id long, embedding array<float>"
    )
    out = vi.search_ivf_pq(spark, path, queries, k=5, n_probe=1)
    assert out["files_opened"] < out["files_total"]


def test_adc_scan_never_reads_embeddings(spark, built):
    path, rows, _ = built
    queries = spark.createDataFrame(
        [(0, rows[0][1])], "query_id long, embedding array<float>"
    )
    out = vi.search_ivf_pq(spark, path, queries, k=5, n_probe=8)
    plan = out["result"]._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans and all("embedding" not in ln for ln in scans)


def test_rerank_improves_or_matches_order(spark, built):
    path, rows, _ = built
    queries = spark.createDataFrame(
        [(5, rows[5][1])], "query_id long, embedding array<float>"
    )
    rr = vi.search_ivf_pq(spark, path, queries, k=10, n_probe=8, rerank=50)
    res = rr["result"].collect()
    assert len(res) == 10
    assert "sim" in res[0].asDict()
    exact = _exact_topk(rows, 5, 10)
    got = [r["neighbor_id"] for r in sorted(res, key=lambda r: r["rank"])]
    # reranked top-10 must be a near-superset of the exact top-10
    assert len(set(got) & set(exact)) >= 8
