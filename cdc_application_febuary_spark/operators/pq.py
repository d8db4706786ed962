"""Product quantization (PQ) for embedding columns — the compression tier
that makes 100 TB-scale vector search feasible (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the IVF+PQ layout
every large ANN system uses).

A d-dim float vector (4d bytes) becomes m uint8 codes (m bytes): the
dimensions split into m subspaces, each quantized against its own
k-centroid codebook. Search is ASYMMETRIC distance computation (ADC): the
full-precision query builds an (m, k) lookup table of partial squared
distances ONCE, then every stored vector's distance is m table lookups —
a numpy gather over the whole partition at C speed, no per-row Python.

Scale shape mirrors `similarity.py`/`vector_index.py`:

* training consumes a bounded sample driver-side (deterministic seeded
  k-means, a few Lloyd iterations — codebooks are KBs and broadcast in
  the UDF closure);
* encoding is one Arrow `mapInPandas` pass (corpus never shuffles);
* search scans codes per partition with per-partition top-k, then a
  global TakeOrdered of partition winners — identical plan to the
  brute-force tier, but the scan reads m bytes/vector instead of 4d,
  a 32x I/O cut at d=64/m=8.

Vectors are L2-normalized before training/encoding, so ranking by
quantized L2 approximates ranking by cosine (exact-tier parity is the
recall test, not an oracle — quantization is lossy by design).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module scope: pandas_udf type hints must resolve

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _kmeans(data: np.ndarray, k: int, iters: int, rng: np.random.Generator):
    k = min(k, len(data))
    cents = data[rng.choice(len(data), size=k, replace=False)]
    for _ in range(iters):
        d = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = data[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def train_pq_matrix(
    sample: np.ndarray, m: int, k: int, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """Codebooks (m, k, d/m) from an in-memory sample matrix (already the
    bounded driver-side representation — IVF-PQ reuses its cluster-training
    sample here)."""
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            _kmeans(sample[:, i * sub : (i + 1) * sub], k, iters, rng)
            for i in range(m)
        ]
    )


def train_pq(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    max_train: int = 2048,
    iters: int = 8,
    seed: int = 0,
) -> np.ndarray:
    """Codebooks (m, k, d/m) from a bounded training sample. ``d`` must be
    divisible by ``m``."""
    sample = np.array(
        [r[0] for r in emb.select(vec_col).limit(max_train).collect()],
        dtype=np.float64,
    )
    return train_pq_matrix(sample, m, k, iters, seed)


def adc_lut(codebooks: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(m, k) partial-squared-distance lookup table for one normalized
    query — the ADC precomputation shared by `pq_search` and the IVF-PQ
    index scan."""
    m, k, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    return np.stack(
        [
            ((codebooks[i] - q[i * sub : (i + 1) * sub][None, :]) ** 2).sum(
                axis=1
            )
            for i in range(m)
        ]
    )


def encode_pq(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one Arrow pass; codes are the per-subspace
    nearest-centroid indices of the normalized vector."""
    import pandas as pd

    m, k, sub = codebooks.shape

    def batches(it):
        for pdf in it:
            vecs = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            codes = np.empty((len(vecs), m), dtype=np.int64)
            for i in range(m):
                seg = vecs[:, i * sub : (i + 1) * sub]
                d = (
                    (seg[:, None, :] - codebooks[i][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, i] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        batches, "id long, codes array<long>"
    )


def _encode_codes_udf(codebooks: np.ndarray):
    """Column form of :func:`encode_pq` (same normalization, same
    per-subspace argmin arithmetic, codes bit-identical): lets a caller
    compute codes IN THE SAME projection as other Arrow UDFs — e.g. the
    IVF-PQ build's cluster assignment — so one pass over the corpus yields
    both, instead of two mapInPandas scans re-joined on vec_id."""
    m, k, sub = codebooks.shape

    @pandas_udf("array<long>")
    def encode(v: pd.Series) -> pd.Series:
        vecs = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        codes = np.empty((len(vecs), m), dtype=np.int64)
        for i in range(m):
            seg = vecs[:, i * sub : (i + 1) * sub]
            d = ((seg[:, None, :] - codebooks[i][None, :, :]) ** 2).sum(
                axis=2
            )
            codes[:, i] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def pq_search(
    codes: DataFrame,
    codebooks: np.ndarray,
    query: "np.ndarray",
    topk: int = 10,
) -> DataFrame:
    """Top-k ids for one query vector by ADC distance: (id, adc_dist)
    ascending. The per-partition scan is a single numpy gather-sum."""
    import pandas as pd

    m, k, sub = codebooks.shape
    lut = adc_lut(codebooks, query)  # (m, k)

    def scan(it):
        for pdf in it:
            if not len(pdf):
                continue
            cc = np.stack(pdf["codes"].to_numpy())  # (n, m)
            dist = lut[np.arange(m)[None, :], cc].sum(axis=1)
            order = np.argsort(dist, kind="stable")[:topk]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy()[order],
                    "adc_dist": dist[order],
                }
            )

    partial = codes.mapInPandas(scan, "id long, adc_dist double")
    return partial.orderBy(F.asc("adc_dist"), F.asc("id")).limit(topk)
