"""Per-dimension embedding PSI (`operators/drift.py:embedding_drift`):
zero drift on identical populations, planted drift localizes to the
shifted dimension, and partitioning invariance of the exact psi_e6."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.drift import embedding_drift


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_identical_populations_zero_psi(spark):
    vs = [[0.1 * (i % 7) - 0.3, 0.05 * (i % 5)] for i in range(50)]
    df = _vecs(spark, vs)
    out = {r["dim"]: r["psi_e6"] for r in embedding_drift(df, df).collect()}
    assert out == {0: 0, 1: 0}  # p == q exactly -> every term rounds to 0


def test_planted_shift_localizes(spark):
    base = [[0.1 * (i % 7) - 0.3, 0.05 * (i % 5)] for i in range(60)]
    shifted = [[v[0], v[1] + 0.55] for v in base]  # dim 1 moves ~2 buckets
    out = {
        r["dim"]: r["psi_e6"]
        for r in embedding_drift(_vecs(spark, base), _vecs(spark, shifted)).collect()
    }
    assert out[0] == 0
    assert out[1] > 200_000  # PSI > 0.2: the conventional action line


def test_psi_partitioning_invariant(spark):
    base = _vecs(spark, [[0.01 * i - 0.25, 0.02 * (i % 9)] for i in range(80)])
    cur = _vecs(spark, [[0.015 * i - 0.3, 0.02 * (i % 4)] for i in range(70)])
    a = sorted(map(tuple, embedding_drift(base, cur).collect()))
    b = sorted(
        map(
            tuple,
            embedding_drift(base.repartition(7), cur.repartition(5)).collect(),
        )
    )
    assert a == b
