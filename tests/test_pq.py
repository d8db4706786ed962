"""Product quantization: compression contract, ADC recall, determinism."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators import pq


def _clustered(spark, n=400, d=32, n_clusters=8, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + rng.normal(size=d) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_codes_are_m_bytes_and_deterministic(spark):
    emb, _ = _clustered(spark)
    cb = pq.train_pq(emb, m=4, k=16, seed=1)
    assert cb.shape == (4, 16, 8)
    c1 = {r["id"]: r["codes"] for r in pq.encode_pq(emb, cb).collect()}
    c2 = {r["id"]: r["codes"] for r in pq.encode_pq(emb.repartition(7), cb).collect()}
    assert c1 == c2
    assert all(len(v) == 4 for v in c1.values())
    assert all(0 <= x < 16 for v in c1.values() for x in v)


def test_adc_search_recall_against_exact_cosine(spark):
    emb, rows = _clustered(spark, n=400, d=32)
    cb = pq.train_pq(emb, m=8, k=16, seed=2)
    codes = pq.encode_pq(emb, cb).persist()

    mat = np.array([v for _, v in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # standard PQ evaluation: exact top-10 recalled within ADC top-50.
    # (Within a tight cluster the 8-byte code can't ORDER members — that
    # is the designed resolution limit — but it must RETRIEVE them.)
    recalls = []
    for qi in (0, 3, 11):
        q = np.array(rows[qi][1])
        qn = q / np.linalg.norm(q)
        exact = set(np.argsort(-(mat @ qn), kind="stable")[:10])
        got = {
            r["id"] for r in pq.pq_search(codes, cb, q, topk=50).collect()
        }
        recalls.append(len(got & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.8


def test_self_is_nearest(spark):
    emb, rows = _clustered(spark, n=200, d=32)
    cb = pq.train_pq(emb, m=4, k=16, seed=3)
    codes = pq.encode_pq(emb, cb)
    top = pq.pq_search(codes, cb, np.array(rows[42][1]), topk=5).collect()
    # the query's own vector must land in the top few ADC hits
    assert 42 in {r["id"] for r in top}


def test_dim_not_divisible_raises(spark):
    emb, _ = _clustered(spark, d=30)
    with pytest.raises(ValueError):
        pq.train_pq(emb, m=4)
