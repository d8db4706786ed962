"""Unit pins for rerank_cross_encoder: the fixed-point interaction score
must match an independent numpy recompute, and the reranked top-5 must be
a subset of the exact top-20 candidate tier (two-stage containment)."""

import numpy as np

from pyspark.sql import functions as F

from cdc_application_febuary_spark.catalog import load_table
from cdc_application_febuary_spark.operators import similarity
from cdc_application_febuary_spark.queries.pipeline_ops import (
    _RERANK_CAND_K,
    rerank_cross_encoder,
)


def _np_score(qv, dv):
    qq = np.floor(np.asarray(qv, dtype="float64") * 4096).astype("int64")
    dq = np.floor(np.asarray(dv, dtype="float64") * 4096).astype("int64")
    i = np.arange(len(qq), dtype="int64")
    w = (i * 2654435761) % 97 - 48
    return int((qq * dq * w).sum())


def test_rerank_scores_match_numpy_and_candidates_contain(spark, sf_dir):
    got = rerank_cross_encoder(spark, sf_dir)
    rows = got.collect()
    emb = {
        int(r["vec_id"]): list(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # every reranked score equals the independent numpy recompute
    for r in rows:
        assert int(r["score"]) == _np_score(
            emb[int(r["query_id"])], emb[int(r["neighbor_id"])]
        ), (r["query_id"], r["neighbor_id"])
    # containment: rerank output pairs live inside the exact top-20 tier
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in similarity.cosine_topk_blocked(
            e, queries, k=_RERANK_CAND_K, query_id_col="query_id"
        )
        .select("query_id", "neighbor_id")
        .collect()
    }
    assert all(
        (int(r["query_id"]), int(r["neighbor_id"])) in cand for r in rows
    )
    # exactly top-5 per query, ranks 1..5
    per_q = {}
    for r in rows:
        per_q.setdefault(int(r["query_id"]), []).append(int(r["rerank"]))
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
