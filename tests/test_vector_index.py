"""Persisted IVF index: exactness at full probe, file pruning, versioning."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import vector_index as vi
from cdc_application_febuary_spark.operators.similarity import cosine_topk
from cdc_application_febuary_spark.sources import manifest_table as mt


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    # clustered data: 4 well-separated blobs in 8-dim
    blobs = []
    for c in range(4):
        center = np.zeros(8)
        center[c * 2] = 5.0
        blobs.append(rng.normal(size=(50, 8)) * 0.3 + center)
    X = np.vstack(blobs)
    rows = [(i, row.tolist()) for i, row in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(6).persist()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return corpus.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_full_probe_equals_bruteforce(spark, corpus, queries, tmp_path):
    t = str(tmp_path / "idx")
    vi.build_ivf_index(corpus, t, n_centroids=8, files_per_cluster_group=2)
    out = vi.search_ivf_index(spark, t, queries, k=3, n_probe=8)
    exact = cosine_topk(corpus, queries, k=3)
    got = sorted(tuple(r) for r in out["result"].collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want


def test_search_prunes_files(spark, corpus, queries, tmp_path):
    t = str(tmp_path / "idx")
    vi.build_ivf_index(corpus, t, n_centroids=8, files_per_cluster_group=4)
    one_q = queries.limit(1)
    out = vi.search_ivf_index(spark, t, one_q, k=3, n_probe=1)
    assert out["files_total"] > 1
    assert out["files_opened"] < out["files_total"]
    assert out["result"].count() == 3


def test_high_recall_at_low_probe_on_clustered_data(spark, corpus, queries, tmp_path):
    t = str(tmp_path / "idx")
    vi.build_ivf_index(corpus, t, n_centroids=8)
    approx = vi.search_ivf_index(spark, t, queries, k=3, n_probe=2)["result"]
    exact = cosine_topk(corpus, queries, k=3)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.9  # blobs are separated: probing works


def test_rebuild_is_versioned_snapshot(spark, corpus, queries, tmp_path):
    t = str(tmp_path / "idx")
    v0 = vi.build_ivf_index(corpus, t, n_centroids=4)["version"]
    v1 = vi.build_ivf_index(corpus, t, n_centroids=8)["version"]
    assert (v0, v1) == (0, 1)
    # searching the OLD index version still works and uses its own centroids
    out = vi.search_ivf_index(spark, t, queries, k=3, n_probe=4, version=0)
    exact = cosine_topk(corpus, queries, k=3)
    assert sorted(tuple(r) for r in out["result"].collect()) == sorted(
        tuple(r) for r in exact.collect()
    )
    assert mt.read_commit_meta(spark, t, 1)["n_centroids"] == 8


def test_non_index_table_rejected(spark, corpus, tmp_path):
    t = str(tmp_path / "plain")
    mt.write_table(corpus, t, ["vec_id"])
    with pytest.raises(ValueError, match="not an IVF index"):
        vi.search_ivf_index(
            spark, t, corpus.select(F.col("vec_id").alias("query_id"), "embedding").limit(1)
        )
