"""Fixed-point integer k-means over quantized embedding coordinates —
the clustering step of semantic curation pipelines (SemDeDup's cluster
stage, D4's prototype cells, IVF coarse quantizers) in a form every
engine replays BIT-FOR-BIT.

The float tiers of those operators stay numpy/pytest-pinned
(`operators/dedup.py:semantic_dedup`, `operators/vector_index.py`); this
module is the `pagerank_fixedpoint` / `fit_logreg_fixedpoint` treatment
applied to Lloyd's algorithm, so a SQL oracle can re-derive every
assignment and every centroid update exactly:

* coordinates quantize once to the 4096 grid (`floor(v*4096)`, the PCA /
  coreset convention — float->double cast, multiply, floor: all
  correctly-rounded IEEE ops, identical in any engine);
* centroids live at 1024x sub-precision: ``c = tdiv(S * 1024, n)`` with
  S the exact BIGINT coordinate sum of the cluster's members and tdiv
  truncation toward zero (== Spark ``div``; DuckDB needs the CASE flip
  because its ``//`` floors — `queries.pipeline_ops._tdiv_sql`);
* assignment is exact-integer argmin of ``sum((x*1024 - c)^2)`` with
  ties to the smaller cluster id (decidable identically everywhere);
* per-point distances downscale by 2^20 (one truncating shift, exact
  and replayable) BEFORE the per-cluster sum, so reported inertia fits
  BIGINT at any corpus size;
* an emptied cluster keeps its previous centroid (the guard both sides
  state explicitly).

Scale shape: centroids are k x d integers — bounded driver state, the
pagerank bounded-scalar pattern. Each iteration is ONE job over the
points (argmin against k literal arrays — no join, no shuffle) feeding
one (cluster, dim)-keyed aggregation; the collect moves k*d longs.
"""

from __future__ import annotations

# pandas/numpy at MODULE scope: the pandas_udf in _assign infers its
# types from string annotations (future-annotations), which must resolve
# against module globals (CLAUDE.md rule)
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

CSCALE = 1024  # centroid sub-precision on top of the 4096 coordinate grid
DIST_SHIFT = 20  # per-point distance downscale: keeps inertia sums in BIGINT


def _tdiv_int(a: int, b: int) -> int:
    """Python-int division truncating toward zero (== Spark div)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, q) with q the 4096-grid BIGINT coordinates."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col},"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 4096) AS BIGINT))"
        ).alias("q"),
    )


def _assign(pts: DataFrame, cents: list[list[int]]) -> DataFrame:
    """(vec_id, q, cluster, dist): exact argmin, ties to the smaller id.

    r10: the distances run as one Arrow-batched numpy pass. The previous
    all-expression form (k zip_with/aggregate distance columns staged
    once, then least() + a CASE argmin) evaluated interpreted — Spark
    does not codegen higher-order functions, so every row paid ~k*d
    lambda invocations (~1.2 s per assignment job at sf0.1 vs ~0.1 s
    vectorized; five assignment passes dominate the whole query). The
    arithmetic is IDENTICAL exact int64: coordinates and centroids are
    bounded by the dim<=127 guard in kmeans_fixedpoint, so diff^2 sums
    stay under 2^53 — no float step, no overflow; np.argmin takes the
    FIRST minimal index, which is exactly the ties-to-smaller-id rule."""
    C = np.asarray(cents, dtype=np.int64)

    @pandas_udf("cluster long, dist long")
    def _argmin(q: pd.Series) -> pd.DataFrame:
        if len(q) == 0:
            return pd.DataFrame({"cluster": [], "dist": []}, dtype="int64")
        Q = np.asarray(list(q), dtype=np.int64) * CSCALE  # (n, d)
        # (n, k, d) diffs in int64 — batch-bounded by Arrow batch size
        diff = Q[:, None, :] - C[None, :, :]
        dists = (diff * diff).sum(axis=2)  # (n, k) exact int64
        cl = dists.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": cl.astype(np.int64),
                "dist": dists[np.arange(len(cl)), cl],
            }
        )

    staged = pts.select("vec_id", "q", _argmin("q").alias("__a"))
    return staged.select(
        "vec_id", "q", F.col("__a.cluster").alias("cluster"),
        F.col("__a.dist").alias("dist"),
    )


def kmeans_fixedpoint(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` exact Lloyd steps from the deterministic init
    (the k lowest-id vectors, scaled to centroid precision) and return
    (per-cluster stats DataFrame, final centroid integer lists).

    Stats columns: cluster, n_members, sum_dist (per-point 2^-20-scaled
    exact inertia), min_member, centroid_sum — every one an exact BIGINT
    a SQL replay reproduces."""
    pts = quantize_vectors(df, vec_col, id_col).persist()
    init = pts.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    if len(init) < k:
        raise ValueError(f"need ids 0..{k - 1} present for the exact init")
    cents = [[int(v) * CSCALE for v in r["q"]] for r in init]
    dim = len(cents[0])
    # The 2^-DIST_SHIFT downscale uses (dist - dist % 2^20) / 2^20 with a
    # DOUBLE division, exact only while per-point dist < 2^53. With
    # coordinates in [-1, 1] each squared term is <= (2*4096*CSCALE)^2 =
    # 2^46, so dist <= dim * 2^46 — exact up to dim 127 (fixture: 64).
    if dim * (2 * 4096 * CSCALE) ** 2 >= 1 << 53:
        raise ValueError(
            f"kmeans_fixedpoint: dim={dim} can push per-point dist past "
            f"2^53, desyncing the 2^-{DIST_SHIFT} downscale from the SQL "
            "replay; max exact dim is 127"
        )
    for _ in range(iters):
        upd = (
            _assign(pts, cents)
            .select("cluster", F.posexplode("q").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = [list(c) for c in cents]  # emptied cluster keeps its centroid
        for r in upd:
            nxt[r["cluster"]][r["dim"]] = _tdiv_int(
                int(r["s"]) * CSCALE, int(r["n"])
            )
        cents = nxt
    fin = _assign(pts, cents).withColumn(
        "dist_sc", ((F.col("dist") - F.col("dist") % (1 << DIST_SHIFT)) / (1 << DIST_SHIFT)).cast("long")
    )
    got = fin.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("dist_sc").cast("long").alias("sum_dist"),
        F.min("vec_id").cast("long").alias("min_member"),
    )
    spark = df.sparkSession
    cmeta = spark.createDataFrame(
        [(i, sum(c)) for i, c in enumerate(cents)],
        "cluster long, centroid_sum long",
    )
    stats = (
        cmeta.join(got, "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
            F.coalesce("sum_dist", F.lit(0)).cast("long").alias("sum_dist"),
            F.coalesce("min_member", F.lit(-1)).cast("long").alias("min_member"),
            "centroid_sum",
        )
        .localCheckpoint(eager=True)
    )
    pts.unpersist()
    return stats, cents
