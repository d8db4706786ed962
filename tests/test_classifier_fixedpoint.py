"""fit_logreg_fixedpoint (exact integer hard-sigmoid GD): python integer
reference parity, partitioning invariance, truncating-division semantics,
and monotone Brier descent on a separable problem."""

import pytest
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.classifier import (
    LogRegFixedPoint,
    _py_tdiv,
    _tdiv,
    auc_exact_pair,
    fit_logreg_fixedpoint,
)


def _py_fit(rows, feats, iters=8, lr_shift=2):
    """Pure-python integer replay of the documented fixed-point recipe."""
    import math

    n = len(rows)
    d = len(feats)
    means = [sum(r[j] for r in rows) // n for j in range(d)]
    scales = [
        math.isqrt(sum((r[j] - means[j]) ** 2 for r in rows) // n) + 1
        for j in range(d)
    ]
    zq = [
        [_py_tdiv(16 * (r[j] - means[j]), scales[j]) for j in range(d)]
        + [r[d]]
        for r in rows
    ]
    w, b = [0] * d, 0
    briers = []
    for _ in range(iters):
        gs, gb, brier = [0] * d, 0, 0
        for z in zq:
            m16 = 16 * b + sum(w[j] * z[j] for j in range(d))
            p = max(min(500000 + _py_tdiv(m16, 64), 1000000), 0)
            e = p - 1000000 * z[d]
            brier += e * e
            gb += e
            for j in range(d):
                gs[j] += e * z[j]
        briers.append(brier)
        b -= _py_tdiv(gb, n << lr_shift)
        for j in range(d):
            w[j] -= _py_tdiv(gs[j], n << (4 + lr_shift))
    return w, b, briers


def _mkdf(spark, rows, feats):
    return spark.createDataFrame(
        rows, ", ".join(f"{c} long" for c in feats) + ", y long"
    )


def test_python_reference_parity(spark):
    rows = [
        (i * 7 % 50, (i * 13 + 3) % 40, (1 if i % 3 else 20), 1 if i % 3 else 0)
        for i in range(60)
    ]
    feats = ["a", "b", "c"]
    m = fit_logreg_fixedpoint(_mkdf(spark, rows, feats), feats, "y", iters=8)
    w, b, briers = _py_fit(rows, feats, iters=8)
    assert m.weights_e6 == w
    assert m.bias_e6 == b
    assert m.brier_e12_sums == briers


def test_partitioning_invariance(spark):
    rows = [
        ((i * 11) % 90, (i * 5) % 33, i % 4, 1 if (i * 11) % 90 > 40 else 0)
        for i in range(80)
    ]
    feats = ["a", "b", "c"]
    df = _mkdf(spark, rows, feats)
    m1 = fit_logreg_fixedpoint(df, feats, "y", iters=6)
    m2 = fit_logreg_fixedpoint(df.repartition(17), feats, "y", iters=6)
    assert m1.weights_e6 == m2.weights_e6
    assert m1.bias_e6 == m2.bias_e6
    assert m1.brier_e12_sums == m2.brier_e12_sums


def test_brier_descends_on_separable(spark):
    # y = 1 iff a > 50: linearly separable on a single feature
    rows = [(i, i % 7, 1 if i > 50 else 0) for i in range(101)]
    feats = ["a", "b"]
    m = fit_logreg_fixedpoint(_mkdf(spark, rows, feats), feats, "y", iters=8)
    assert m.brier_e12_sums[-1] < m.brier_e12_sums[0]
    # final margins must rank the classes perfectly -> AUC num == den
    df = _mkdf(spark, rows, feats)
    auc = auc_exact_pair(
        df.select(m.margin16_col().alias("s"), "y"), "s", "y"
    ).first()
    assert auc["auc_num"] == auc["auc_den"]


def test_tdiv_truncates_toward_zero(spark):
    df = spark.createDataFrame([(-7,), (7,), (-8,), (0,)], "a long")
    got = sorted(
        r["t"] for r in df.select(_tdiv(F.col("a"), 2).alias("t")).collect()
    )
    assert got == sorted([-3, 3, -4, 0])
    assert _py_tdiv(-7, 2) == -3 and _py_tdiv(7, 2) == 3
