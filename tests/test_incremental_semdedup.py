"""Incremental SemDeDup (`operators/incremental_dedup.py:
semantic_dedup_batch`): cross-batch semantic duplicates dropped against
the survivor store, exactly-once replay, and the store independence
invariant (no two stored vectors of a cluster within threshold)."""

import numpy as np
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.incremental_dedup import (
    semantic_dedup_batch,
)
from cdc_application_febuary_spark.sources import manifest_table as mt


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_cross_batch_semantic_dup_dropped(spark, tmp_path):
    store = str(tmp_path / "sem_store")
    rng = np.random.RandomState(3)
    a = np.eye(6)[0] + 0.01 * rng.randn(6)
    b = np.eye(6)[1] + 0.01 * rng.randn(6)
    c = np.eye(6)[2] + 0.01 * rng.randn(6)
    got1 = semantic_dedup_batch(
        _df(spark, [(0, a), (1, b)]), store, 1,
        n_clusters=3, threshold=0.95, seed=1,
    )
    assert sorted(r["vec_id"] for r in got1.collect()) == [0, 1]
    # batch 2: near-copy of a (dropped vs store), in-batch dup pair of c
    # (collapses to one), novel c admitted
    got2 = semantic_dedup_batch(
        _df(
            spark,
            [
                (10, a + 0.001 * rng.randn(6)),
                (11, c),
                (12, c + 0.001 * rng.randn(6)),
            ],
        ),
        store, 2, n_clusters=3, threshold=0.95, seed=1,
    )
    admitted2 = sorted(r["vec_id"] for r in got2.collect())
    assert 10 not in admitted2, "cross-batch semantic dup leaked"
    assert len(admitted2) == 1 and admitted2[0] in (11, 12)
    # store holds exactly the three admitted representatives
    kept = mt.read_table(spark, store).select("id").collect()
    assert sorted(r["id"] for r in kept) == [0, 1] + admitted2


def test_replay_is_noop(spark, tmp_path):
    store = str(tmp_path / "sem_replay")
    v = [1.0, 0.0, 0.0, 0.0]
    semantic_dedup_batch(
        _df(spark, [(0, v)]), store, 1, n_clusters=2, threshold=0.95
    )
    ver = mt.current_version(spark, store)
    assert (
        semantic_dedup_batch(
            _df(spark, [(99, v)]), store, 1, n_clusters=2, threshold=0.95
        )
        is None
    )
    assert mt.current_version(spark, store) == ver, "replay wrote the store"


def test_store_independence_invariant_on_fixture(spark, sf_dir, tmp_path):
    """Fold the fixture embeddings in three batches; afterwards no two
    stored vectors of one cluster may sit at >= threshold cosine — the
    invariant the operator promises at any batch count."""
    from cdc_application_febuary_spark.catalog import load_table

    store = str(tmp_path / "sem_fold")
    emb = load_table(spark, sf_dir, "embeddings")
    n_in, n_adm = 0, 0
    for b in range(3):
        part = emb.where(F.col("vec_id") % 3 == b)
        n_in += part.count()
        out = semantic_dedup_batch(
            part, store, b + 1, n_clusters=8, threshold=0.45, seed=42
        )
        n_adm += out.count()
    rows = mt.read_table(spark, store).collect()
    assert len(rows) == n_adm <= n_in
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["vec"])
    for c, vecs in by_cluster.items():
        M = np.asarray(vecs, dtype="float64")
        Mn = M / np.clip(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None
        )
        sims = Mn @ Mn.T
        np.fill_diagonal(sims, 0.0)
        assert sims.max() < 0.45, (c, sims.max())


def test_fold_deterministic(spark, sf_dir, tmp_path):
    from cdc_application_febuary_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def fold(store):
        out = []
        for b in range(2):
            part = emb.where(F.col("vec_id") % 2 == b)
            got = semantic_dedup_batch(
                part, store, b + 1, n_clusters=8, threshold=0.45, seed=42
            )
            out.extend(r["vec_id"] for r in got.collect())
        return sorted(out)

    assert fold(str(tmp_path / "s1")) == fold(str(tmp_path / "s2"))


def test_srp_batch_lifecycle(spark, tmp_path):
    """Portable SRP tier: the store invariant (no two stored vectors of
    a bucket within threshold), the exactly-once replay guard, and
    partitioning invariance of the admitted set."""
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.operators.incremental_dedup import (
        srp_semantic_dedup_batch,
    )
    from cdc_application_febuary_spark.sources import manifest_table as mt

    def vec(seed):
        return [float((seed * 31 + j * 7) % 13 - 6) for j in range(8)]

    rows = [(i, vec(i % 5)) for i in range(20)]  # heavy duplication
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    store = str(tmp_path / "kept")
    a1 = srp_semantic_dedup_batch(
        emb.where(F.col("vec_id") < 10), store, 1, threshold=0.95
    )
    n1 = a1.count()
    a2 = srp_semantic_dedup_batch(
        emb.where(F.col("vec_id") >= 10), store, 2, threshold=0.95
    )
    n2 = a2.count()
    # 5 distinct directions total; batch 1 admits <= 5, batch 2 admits
    # only directions batch 1 missed (here: none — same 5 repeat)
    assert n1 == 5 and n2 == 0
    assert mt.read_table(spark, store).count() == 5
    # replay of a committed batch is a no-op
    assert (
        srp_semantic_dedup_batch(
            emb.where(F.col("vec_id") >= 10), store, 2, threshold=0.95
        )
        is None
    )
    assert mt.read_table(spark, store).count() == 5
    # partitioning invariance of the admitted id set
    store2 = str(tmp_path / "kept2")
    b1 = srp_semantic_dedup_batch(
        emb.where(F.col("vec_id") < 10).repartition(7), store2, 1,
        threshold=0.95,
    )
    assert sorted(r["vec_id"] for r in b1.collect()) == sorted(
        r["vec_id"] for r in a1.collect()
    )
