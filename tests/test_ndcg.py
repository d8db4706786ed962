"""retrieval_ndcg (`operators/similarity.py`): hand-checkable nDCG on a
planted geometry, and the discount-table contract."""

import math

from cdc_application_febuary_spark.operators.similarity import (
    NDCG_DISC_E6,
    NDCG_IDCG_PREFIX_E6,
    retrieval_ndcg,
)


def test_discount_table_is_the_log2_series():
    for i, d in enumerate(NDCG_DISC_E6, start=1):
        assert d == int(1e6 / math.log2(i + 1) + 0.5)
    assert NDCG_IDCG_PREFIX_E6[10] == sum(NDCG_DISC_E6)


def test_planted_geometry(spark):
    # query 0 (label 0): its two label-mates sit nearest, so rel = 1 at
    # ranks 1-2 and 0 after -> dcg = disc[0] + disc[1]; n_rel = 2 ->
    # idcg = prefix[2]: a perfect ranking scores ndcg exactly 1.
    import numpy as np

    rows = []
    base = np.zeros(8)
    base[0] = 1.0
    rows.append((0, list(base), 0))
    rows.append((1, list(base * 0.9 + 0.01), 0))
    rows.append((2, list(base * 0.8 + 0.02), 0))
    for i in range(3, 13):
        v = np.zeros(8)
        v[1 + (i % 6)] = 1.0
        rows.append((i, list(v + 0.001 * i), 1 + (i % 3)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    q = df.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = retrieval_ndcg(df, q, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rel"] == 2
    assert r["dcg_e6"] == NDCG_DISC_E6[0] + NDCG_DISC_E6[1]
    assert r["idcg_e6"] == NDCG_IDCG_PREFIX_E6[2]
