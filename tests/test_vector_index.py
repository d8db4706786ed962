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


def test_append_then_full_probe_equals_bruteforce_on_union(
    spark, corpus, queries, tmp_path
):
    """faiss-add analog: build on 70% of the corpus, append the rest in
    two batches, and full-probe search over the union must exactly equal
    brute force over the union — appended vectors are first-class."""
    t = str(tmp_path / "idx")
    base = corpus.where(F.col("vec_id") % 10 < 7)
    extra1 = corpus.where(F.col("vec_id") % 10 == 7)
    extra2 = corpus.where(F.col("vec_id") % 10 > 7)
    vi.build_ivf_index(base, t, n_centroids=8, files_per_cluster_group=2)
    s1 = vi.append_ivf_index(extra1, t, batch_id=0)
    s2 = vi.append_ivf_index(extra2, t, batch_id=1)
    assert s1["version"] == 1 and s2["version"] == 2
    assert s2["total_appended_rows"] == extra1.count() + extra2.count()

    out = vi.search_ivf_index(spark, t, queries, k=3, n_probe=8)
    exact = cosine_topk(corpus, queries, k=3)
    got = sorted(tuple(r) for r in out["result"].collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want


def test_append_replay_is_dropped_whole(spark, corpus, tmp_path):
    t = str(tmp_path / "idx")
    base = corpus.where(F.col("vec_id") < 150)
    extra = corpus.where(F.col("vec_id") >= 150)
    vi.build_ivf_index(base, t, n_centroids=8)
    assert vi.append_ivf_index(extra, t, batch_id=5)["version"] == 1
    # replayed batch commits nothing
    assert vi.append_ivf_index(extra, t, batch_id=5) is None
    assert mt.current_version(spark, t) == 1
    # next batch id proceeds
    assert vi.append_ivf_index(extra.limit(3), t, batch_id=6)["version"] == 2


def test_unkeyed_append_keeps_the_replay_watermark(spark, corpus, tmp_path):
    """ADVICE r3: an unkeyed append between keyed ones must CARRY the
    stored batch_id forward — dropping it would let a replay of an
    already-committed batch id re-admit duplicate vectors."""
    t = str(tmp_path / "idx")
    base = corpus.where(F.col("vec_id") < 150)
    extra = corpus.where(F.col("vec_id") >= 150)
    vi.build_ivf_index(base, t, n_centroids=8)
    assert vi.append_ivf_index(extra, t, batch_id=5)["version"] == 1
    # unkeyed append (ad-hoc backfill) in between
    assert vi.append_ivf_index(extra.limit(2), t)["version"] == 2
    assert mt.read_commit_meta(spark, t, 2)["batch_id"] == 5
    # replay of batch 5 is still dropped whole
    assert vi.append_ivf_index(extra, t, batch_id=5) is None
    assert mt.current_version(spark, t) == 2


def test_append_search_still_prunes_and_snapshots(
    spark, corpus, queries, tmp_path
):
    t = str(tmp_path / "idx")
    base = corpus.where(F.col("vec_id") % 2 == 0)
    vi.build_ivf_index(base, t, n_centroids=8, files_per_cluster_group=4)
    one_q = queries.limit(1)
    pre = vi.search_ivf_index(spark, t, one_q, k=3, n_probe=1)
    vi.append_ivf_index(
        corpus.where(F.col("vec_id") % 2 == 1), t, files_per_cluster_group=4
    )
    post = vi.search_ivf_index(spark, t, one_q, k=3, n_probe=1)
    # low probe still prunes on the unioned file set
    assert post["files_opened"] < post["files_total"]
    assert post["files_total"] > pre["files_total"]
    # snapshot isolation: version-0 search unaffected by the append
    v0 = vi.search_ivf_index(spark, t, one_q, k=3, n_probe=1, version=0)
    assert sorted(map(tuple, v0["result"].collect())) == sorted(
        map(tuple, pre["result"].collect())
    )


def test_append_rejects_dim_mismatch_and_non_index(spark, corpus, tmp_path):
    t = str(tmp_path / "idx")
    vi.build_ivf_index(corpus, t, n_centroids=8)
    bad = spark.createDataFrame(
        [(999, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        vi.append_ivf_index(bad, t)
    plain = str(tmp_path / "plain")
    mt.write_table(
        spark.createDataFrame([(1, 2)], "a long, b long"), plain, ["a"]
    )
    with pytest.raises(ValueError, match="not an IVF index"):
        vi.append_ivf_index(corpus.limit(1), plain)
