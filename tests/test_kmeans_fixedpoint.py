"""Fixed-point k-means (`operators/kmeans.py`): numpy-reference parity of
the exact integer iteration, partitioning invariance, empty-cluster
guard, and the init guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.kmeans import (
    CSCALE,
    DIST_SHIFT,
    _tdiv_int,
    kmeans_fixedpoint,
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _reference(vecs, k, iters):
    """Independent python-int implementation of the exact contract."""
    import math

    q = [[math.floor(np.float64(np.float32(x)) * 4096) for x in v] for v in vecs]
    cents = [[v * CSCALE for v in q[i]] for i in range(k)]
    d = len(q[0])

    def assign():
        out = []
        for qi in q:
            best = None
            for ci, c in enumerate(cents):
                dist = sum((a * CSCALE - b) ** 2 for a, b in zip(qi, c))
                if best is None or dist < best[0]:
                    best = (dist, ci)
            out.append(best)
        return out

    for _ in range(iters):
        asg = assign()
        for ci in range(k):
            members = [q[i] for i, (_, c) in enumerate(asg) if c == ci]
            if not members:
                continue
            cents[ci] = [
                _tdiv_int(sum(m[j] for m in members) * CSCALE, len(members))
                for j in range(d)
            ]
    asg = assign()
    stats = {}
    for i, (dist, ci) in enumerate(asg):
        s = stats.setdefault(ci, [0, 0, None])
        s[0] += 1
        s[1] += dist >> DIST_SHIFT
        s[2] = i if s[2] is None else min(s[2], i)
    return {
        ci: (s[0], s[1], s[2], sum(cents[ci])) for ci, s in stats.items()
    }, cents


def test_matches_python_reference(spark):
    rng = np.random.RandomState(3)
    vecs = rng.uniform(-0.5, 0.5, size=(40, 6)).astype(np.float32)
    stats, cents = kmeans_fixedpoint(_df(spark, vecs), k=3, iters=3)
    ref, ref_cents = _reference(vecs, k=3, iters=3)
    assert cents == ref_cents
    for r in stats.collect():
        assert r["cluster"] in ref
        n, sd, mm, cs = ref[r["cluster"]]
        assert (r["n_members"], r["sum_dist"], r["min_member"], r["centroid_sum"]) == (n, sd, mm, cs)


def test_partitioning_invariant(spark):
    rng = np.random.RandomState(9)
    vecs = rng.uniform(-0.5, 0.5, size=(60, 5)).astype(np.float32)
    a, ca = kmeans_fixedpoint(_df(spark, vecs), k=4, iters=2)
    b, cb = kmeans_fixedpoint(
        _df(spark, vecs).repartition(11), k=4, iters=2
    )
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_cluster_keeps_centroid_and_init_guard(spark):
    # two tight groups far apart; k=3 -> the centroid seeded from the
    # third point (inside group one) empties after step 1 and must keep
    # its coordinates in the report
    vecs = [[0.01, 0.0], [0.012, 0.0], [0.011, 0.001]] + [
        [0.4, 0.4], [0.41, 0.41]
    ]
    stats, cents = kmeans_fixedpoint(_df(spark, vecs), k=3, iters=2)
    rows = {r["cluster"]: r for r in stats.collect()}
    assert sum(r["n_members"] for r in rows.values()) == 5
    empties = [r for r in rows.values() if r["n_members"] == 0]
    for r in empties:
        assert r["min_member"] == -1 and r["sum_dist"] == 0
    with pytest.raises(ValueError):
        kmeans_fixedpoint(_df(spark, vecs[:2]), k=3, iters=1)
