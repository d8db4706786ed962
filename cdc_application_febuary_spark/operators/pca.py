"""Distributed PCA / whitening over an embedding column.

The 100 TB-safe decomposition: PCA on N x d vectors only ever needs the
d x d second-moment matrix. Each partition folds its Arrow batches into a
local (count, sum, X^T X) partial — O(d^2) state regardless of partition
size — and emits ONE row; the driver sums the per-partition partials
(P rows of ~d^2 doubles, kilobytes) and eigendecomposes the d x d
covariance. The data itself is never collected, never shuffled: the only
movement is the tiny partial-moment rows. Projection back over the corpus
broadcasts the (k x d) component matrix inside an Arrow-batched
``mapInPandas`` — one matmul per batch.

Sign convention: each component is flipped so its largest-|coefficient|
entry is positive, making the decomposition deterministic (eigenvectors
are otherwise sign-ambiguous across LAPACK builds).

Beyond-reference operator (brief: embedding/similarity tooling); pairs
with ``operators/similarity.py`` — e.g. whiten before SRP-LSH so the
hyperplane buckets see isotropic inputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    total_variance: float  # trace of the covariance

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        return self.explained_variance / self.total_variance


def _moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row per partition: (n, sum(x) flat, sum(x x^T) flat)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            n += len(X)
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        fold, schema="n long, s array<double>, g array<double>"
    )


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 8
) -> PcaModel:
    """Fit a k-component PCA from one distributed pass of moment partials."""
    parts = _moment_partials(df, vec_col, dim).collect()
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]).reshape(dim, dim) for p in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
        total_variance=float(max(np.trace(cov), 1e-300)),
    )


def transform(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project onto the fitted components (optionally whitened to unit
    per-component variance). Components are a few KB — closed over and
    shipped with the task, one matmul per Arrow batch."""
    W = model.components.astype("float64")
    if whiten:
        W = W / np.sqrt(model.explained_variance + eps)[:, None]
    mean = model.mean.astype("float64")
    cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            Y = (X - mean) @ W.T
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(Y)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    )
    return df.mapInPandas(
        project, schema=f"{schema}, {out_col} array<double>"
    ).select(*[c for c in cols if c != vec_col], out_col)
