"""Distributed logistic regression + Mann–Whitney AUC."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators.classifier import (
    auc_score,
    fit_logreg,
)


def _synth(seed=7, n=400):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 3))
    true_w = np.array([1.5, -2.0, 0.5])
    logits = X @ true_w + 0.3
    y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(int)
    return X, y


def _numpy_gd(X, y, iters, lr):
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Z = (X - mu) / sd
    n, d = Z.shape
    w, b = np.zeros(d), 0.0
    for _ in range(iters):
        p = 1 / (1 + np.exp(-(Z @ w + b)))
        e = p - y
        b -= lr * e.sum() / n
        w -= lr * (Z.T @ e) / n
    return w, b


def test_logreg_matches_numpy_gd(spark):
    X, y = _synth()
    rows = [(float(a), float(b_), float(c), int(t)) for (a, b_, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y int")
    model = fit_logreg(df, ["f1", "f2", "f3"], "y", iters=25, lr=1.0)
    w_np, b_np = _numpy_gd(X, y, iters=25, lr=1.0)
    assert np.allclose(model.weights, w_np, atol=1e-8)
    assert abs(model.bias - b_np) < 1e-8
    # training reduced the loss monotonically-ish and substantially
    assert model.losses[-1] < 0.7 * model.losses[0]


def test_logreg_scores_separate_classes(spark):
    X, y = _synth(seed=11)
    rows = [(float(a), float(b_), float(c), int(t)) for (a, b_, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y int")
    model = fit_logreg(df, ["f1", "f2", "f3"], "y", iters=30)
    scored = df.select(model.proba_col().alias("p"), "y")
    auc = auc_score(scored, "p", "y").first()["auc"]
    assert auc > 0.85  # separable-ish synthetic -> strong ranking


def _pairwise_auc(scores, labels):
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    return wins / (len(pos) * len(neg))


def test_auc_exact_including_ties(spark):
    scores = [0.1, 0.4, 0.4, 0.8, 0.8, 0.8, 0.2, 0.9, 0.4, 0.5]
    labels = [0, 0, 1, 1, 0, 1, 0, 1, 0, 1]
    df = spark.createDataFrame(
        list(zip(scores, labels)), "s double, y int"
    )
    got = auc_score(df, "s", "y").first()
    assert got["auc"] == round(_pairwise_auc(scores, labels), 6)
    assert got["n_pos"] == 5 and got["n_neg"] == 5
    assert got["n_score_groups"] == len(set(scores))


@pytest.mark.parametrize("parts", [1, 7])
def test_auc_partitioning_invariant(spark, parts):
    rng = np.random.default_rng(3)
    scores = np.round(rng.random(300), 2)  # heavy ties
    labels = (rng.random(300) < scores).astype(int)
    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, labels)],
        "s double, y int",
    ).repartition(parts)
    got = auc_score(df, "s", "y").first()["auc"]
    assert got == round(_pairwise_auc(scores.tolist(), labels.tolist()), 6)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    assert auc_score(df, "s", "y").first()["auc"] == 1.0
    flipped = spark.createDataFrame(
        [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)], "s double, y int"
    )
    assert auc_score(flipped, "s", "y").first()["auc"] == 0.0
