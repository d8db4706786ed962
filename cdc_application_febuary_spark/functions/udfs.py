"""Vectorized (Arrow-batched) pandas UDFs — the sanctioned Python extension
point (SURVEY §2.10). Used only where built-in column expressions genuinely
can't express the computation; each UDF receives whole Arrow batches as
numpy-backed pandas objects, never row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, ByteType, DoubleType


@F.pandas_udf(ArrayType(ByteType()))
def quantize_embedding_int8(emb: pd.Series) -> pd.Series:
    """Symmetric int8 quantization of float embeddings (the storage-side
    prep for a compact ANN index): scale each vector by 127/max|x|.
    Deterministic; vectorized over the whole Arrow batch."""

    def q(vec):
        if vec is None:
            return None
        a = np.asarray(vec, dtype=np.float64)
        m = np.max(np.abs(a)) if a.size else 0.0
        if m == 0.0:
            return np.zeros(a.shape, dtype=np.int8).tolist()
        return np.clip(np.round(a * (127.0 / m)), -127, 127).astype(np.int8).tolist()

    return emb.map(q)


@F.pandas_udf(DoubleType())
def quantization_error(emb: pd.Series) -> pd.Series:
    """Max absolute reconstruction error of int8 quantization per vector —
    the quality metric you monitor when deciding a quantization level."""

    def err(vec):
        if vec is None:
            return None
        a = np.asarray(vec, dtype=np.float64)
        m = np.max(np.abs(a)) if a.size else 0.0
        if m == 0.0:
            return 0.0
        scale = 127.0 / m
        qv = np.clip(np.round(a * scale), -127, 127)
        return float(np.max(np.abs(qv / scale - a)))

    return emb.map(err)
