"""Distributed PCA: equivalence to in-memory PCA, whitening, determinism."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators import pca


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    # anisotropic 8-dim data: variance concentrated in two planted axes
    base = rng.normal(size=(400, 8)) * np.array([5, 3, 1, 1, 0.5, 0.5, 0.2, 0.2])
    rows = [(i, row.tolist()) for i, row in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(7).persist(), base


def test_matches_numpy_covariance_eigh(spark, vectors):
    df, X = vectors
    model = pca.fit_pca(df, dim=8, k=8)
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-8)
    np.testing.assert_allclose(model.mean, X.mean(axis=0), rtol=0, atol=1e-9)
    assert model.explained_variance_ratio.sum() == pytest.approx(1.0)


def test_partitioning_does_not_change_result(spark, vectors):
    df, _ = vectors
    a = pca.fit_pca(df.repartition(3), dim=8, k=4)
    b = pca.fit_pca(df.repartition(17), dim=8, k=4)
    np.testing.assert_allclose(a.components, b.components, atol=1e-8)
    np.testing.assert_allclose(a.explained_variance, b.explained_variance, rtol=1e-10)


def test_projection_diagonalizes_covariance(spark, vectors):
    df, _ = vectors
    model = pca.fit_pca(df, dim=8, k=4)
    Y = np.vstack(
        [r["pca"] for r in pca.transform(df, model).orderBy("vec_id").collect()]
    )
    cov = np.cov(Y, rowvar=False, bias=True)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-8
    np.testing.assert_allclose(np.diag(cov), model.explained_variance[:4], rtol=1e-8)


def test_whitening_gives_unit_variance(spark, vectors):
    df, _ = vectors
    model = pca.fit_pca(df, dim=8, k=4)
    Y = np.vstack(
        [
            r["pca"]
            for r in pca.transform(df, model, whiten=True).orderBy("vec_id").collect()
        ]
    )
    np.testing.assert_allclose(Y.var(axis=0), np.ones(4), rtol=1e-5)


def test_sign_convention_deterministic(spark, vectors):
    df, _ = vectors
    model = pca.fit_pca(df, dim=8, k=4)
    for comp in model.components:
        assert comp[np.abs(comp).argmax()] > 0


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca.fit_pca(df, dim=8, k=2)
