"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the query set
against the corpus with a window rank; exact, and at 100 TB the right shape
when the query set is small (queries broadcast, corpus never shuffles).

Scale path: signed-random-projection LSH bucketing — deterministic
hash-derived hyperplanes, bucket equi-join instead of the full cross
product, with per-bucket exact re-ranking. Recall < 1 by construction;
multi-probe widens it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import cosine, cosine_pairs, dot, norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_partitions: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, sim).

    `queries` must have (query_id_col, vec_col). Self-matches (same id) are
    excluded. Deterministic tie-break on neighbor id.

    The corpus is repartitioned before the broadcast join: a broadcast join
    preserves the input partitioning, so a single-file corpus would score
    every (query x corpus) pair in ONE task. Spreading the corpus spreads
    the scoring across all cores/executors."""
    parts = corpus_partitions or corpus.sparkSession.sparkContext.defaultParallelism
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
        .repartition(parts)
        .join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim"), 6).alias("sim"),
        )
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_partitions: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query — block-matmul formulation.

    Same contract and results as :func:`cosine_topk` (self-matches
    excluded, ties broken by neighbor id), but instead of materializing the
    query x corpus pair join and scoring each pair with an interpreted
    array expression, each corpus partition is scored as ONE numpy matmul
    against the whole (broadcast) query matrix inside ``mapInPandas``, and
    only the per-partition top-k survives.

    This is the 100 TB shape for small-query-set ANN: the corpus is
    scanned once and never replicated, the query matrix rides to executors
    as a closure broadcast (queries x dim floats), and post-scoring data
    volume is partitions x queries x k rows — independent of corpus size —
    before the final global rank. Per-batch selection orders by
    (sim desc, id asc), the same lexicographic order as the global window,
    so the union of batch top-ks provably contains the global top-k.
    """
    qrows = (
        queries.select(F.col(query_id_col), F.col(vec_col)).collect()
    )
    if not qrows:
        empty = "query_id long, neighbor_id long, rank int, sim double"
        return corpus.sparkSession.createDataFrame([], empty)
    qids = np.asarray([r[0] for r in qrows])
    Q = np.vstack([np.asarray(r[1], dtype="float64") for r in qrows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn

    def score_blocks(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy()
            M = np.vstack(pdf["_vec"].to_numpy()).astype("float64")
            nn = np.linalg.norm(M, axis=1, keepdims=True)
            nn[nn == 0] = 1.0
            sims = (M / nn) @ Qn.T  # (block, n_queries)
            kk = min(k, len(ids))
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                col = sims[:, j].copy()
                col[ids == qids[j]] = -np.inf  # exclude self-match
                top = np.lexsort((ids, -col))[:kk]
                top = top[np.isfinite(col[top])]
                out_q.extend([qids[j]] * len(top))
                out_n.extend(ids[top])
                out_s.extend(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    parts = corpus_partitions or corpus.sparkSession.sparkContext.defaultParallelism
    partial = (
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
        )
        .repartition(parts)
        .mapInPandas(
            score_blocks, "query_id long, neighbor_id long, sim double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim"), 6).alias("sim"),
        )
    )


def _srp_plane(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random ±1 hyperplane from a splitmix64-style
    integer mix — no RNG state, reproducible across engines and runs."""
    out = []
    for d in range(dim):
        x = (plane * 1_000_003 + d * 7_919 + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        out.append(1 if x & 1 else -1)
    return out


def srp_bucket(vec_col, dim: int, planes: int = 8, table: int = 0):
    """Signed-random-projection bucket id (0..2^planes-1) as a column.
    ``table`` offsets the plane seeds so independent hash tables
    (OR-amplification) see independent hyperplane sets."""
    acc = F.lit(0)
    for p in range(planes):
        coeffs = _srp_plane(table * 1009 + p, dim)
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(c)) for c in coeffs]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def _srp_buckets_udf(dim: int, planes: int, tables: int):
    """All tables' SRP buckets in one Arrow batch: (batch x dim) @
    (dim x planes*tables) -> sign bits -> per-table bucket ints. Same
    hyperplanes as :func:`srp_bucket` (``_srp_plane(table*1009 + p)``),
    same ``dot >= 0`` sign rule — one numpy matmul replaces
    planes x tables interpreted higher-order dot products per row."""
    P = np.asarray(
        [
            _srp_plane(t * 1009 + p, dim)
            for t in range(tables)
            for p in range(planes)
        ],
        dtype="float64",
    ).T  # (dim, tables*planes)
    weights = (1 << np.arange(planes, dtype=np.int64))

    @pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        M = np.vstack(v.to_numpy()).astype("float64")
        bits = (M @ P) >= 0  # (batch, tables*planes)
        bits = bits.reshape(len(M), tables, planes)
        vals = (bits * weights).sum(axis=2).astype("int32")  # (batch, tables)
        return pd.Series(list(vals))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probes: int = 0,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by SRP signature, rank
    only within the query's bucket(s). Corpus side is one narrow projection —
    bucketing is a map-side expression, and the join is an equi-join on
    (table, bucket), so the corpus shuffles once by bucket instead of
    replicating per query.

    Two independent recall dials (both multiply candidate volume, not
    corpus passes):
    * ``probes=1`` — multi-probe: each query also searches the `planes`
      buckets at hamming distance 1 from its own (a near neighbor on the
      far side of one hyperplane lands there). Query side grows
      ~(planes+1)x; the corpus bucketing is unchanged.
    * ``tables=L`` — OR-amplification: L independent hyperplane sets; a
      neighbor is a candidate if it shares a bucket in ANY table. Miss
      probability decays as miss_one^L. Corpus rows are bucketed L times
      (corpus side grows Lx), still one shuffle.

    Duplicate candidates across tables/probes are collapsed before
    scoring, so each (query, neighbor) is scored once."""
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    bucketize = _srp_buckets_udf(dim, planes, tables)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.posexplode(bucketize(F.col(vec_col))).alias("tbl", "bucket"),
    ).repartition(parts, "tbl", "bucket")
    q_base = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.posexplode(bucketize(F.col(vec_col))).alias("tbl", "bucket0"),
    )
    if probes >= 1:
        flips = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << p))
                for p in range(planes)
            ],
        )
        q_base = q_base.select(
            "query_id", "qvec", "tbl", F.explode(flips).alias("bucket")
        )
    else:
        q_base = q_base.withColumnRenamed("bucket0", "bucket")
    qb = F.broadcast(q_base)
    cand = (
        cb.join(
            qb,
            (cb.tbl == qb.tbl)
            & (cb.bucket == qb.bucket)
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim", cosine_pairs(F.col("qvec"), F.col("cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round(F.col("sim"), 6).alias("sim")
        )
    )


def _kmeans_sample(
    sample: "list[list[float]]", n_centroids: int, iters: int, seed: int
):
    """Spherical k-means on a bounded training sample, driver-side numpy.

    This is the standard IVF trade (what faiss does): the training set is
    O(n_centroids x a-few-hundred) vectors REGARDLESS of corpus size, so the
    driver never holds more than a few MB even at 100 TB; the expensive part
    — assigning every corpus vector — stays distributed. Deterministic for a
    fixed sample + seed. Empty cells keep their previous centroid."""
    X = np.asarray(sample, dtype="float64")
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    rng = np.random.RandomState(seed)
    n = len(X)
    if n >= n_centroids:
        idx = rng.choice(n, size=n_centroids, replace=False)
    else:
        idx = rng.choice(n, size=n_centroids, replace=True)
    C = X[idx].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    C[j] = m / nm
    return C


def _assign_cluster_udf(centers):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    record batch ((batch x dim) @ (dim x k) -> argmax). The centroid matrix
    rides along as a closure broadcast to every executor — a few KB. This
    is the vectorized-UDF slow path used deliberately: a k-way argmax over
    dense vectors has no efficient built-in Column form (a literal
    expression tree blows the 64 KB janino method limit at k x dim > ~500).
    """
    C = centers  # (k, dim), unit rows

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype("float64")
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (M / norms) @ C.T
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    return assign


def _probe_clusters_udf(centers, n_probe: int):
    """Top-``n_probe`` nearest centroids per query vector, Arrow-batched.
    np.argsort is stable, so ties break to the lowest cluster id — matching
    the corpus-side argmax tie-break."""
    C = centers

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype("float64")
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (M / norms) @ C.T
        order = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    return probe


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    max_train: int = 4096,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other classic ANN scale
    path next to SRP-LSH: cluster the corpus once, then search only the
    ``n_probe`` clusters nearest each query.

    Spark-first shape:
    - train: spherical k-means on a deterministic bounded sample
      (``max_train`` rows -> driver numpy, the faiss trade; see
      ``_kmeans_sample``). One small collect job, independent of corpus
      size.
    - assign + probe: Arrow-batched pandas UDFs (numpy matmul per batch) —
      the deliberate vectorized slow path, since a k x dim literal
      expression tree exceeds janino's 64 KB codegen limit.
    - search: equi-join on cluster id — the corpus shuffles once by
      cluster, queries (with probe lists exploded) broadcast; at 1000
      executors the big side never replicates. Exact cosine re-rank JVM-side
      on the raw vectors (cosine is normalization-invariant).
    - ``n_probe >= n_centroids`` degenerates to exact brute force — the
      property the tests pin.

    Recall/cost dial: recall grows with n_probe (cost ~ n_probe/n_centroids
    of brute force per query).
    """
    # deterministic sample order — a bare limit() shifts with input
    # partitioning and silently retrains different centroids (the
    # semantic_dedup trap pinned in CLAUDE.md)
    sample_rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(max_train)
        .collect()
    )
    centers = _kmeans_sample([r["v"] for r in sample_rows], n_centroids, iters, seed)
    centers = np.asarray(centers, dtype="float64")

    assign = _assign_cluster_udf(centers)
    probe = _probe_clusters_udf(centers, n_probe)

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    probed = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe(F.col(vec_col))).alias("cluster"),
    )
    scored = assigned.join(
        F.broadcast(probed),
        (assigned.cluster == probed.cluster)
        & (F.col("query_id") != F.col("neighbor_id")),
    ).withColumn("sim", cosine_pairs(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round(F.col("sim"), 6).alias("sim")
        )
    )


def _srp_bucket_fold_udf(planes: int):
    """Arrow-batched fold of exact integer micro-units into the portable
    SRP bucket: weights are the same ``((i * 2654435761 + (p+1) * 40503)
    % 97) - 48`` integers, the dot products run as ONE int64 matmul per
    record batch (exact — no floats anywhere), and the sign of the
    micro-unit sum equals the sign of the DECIMAL(18,6) sum it scales by
    10^6, so bits and buckets are bit-identical to the explode+groupBy
    form and to the SQL oracles that replay it. Empty rows yield NULL
    (callers pre-filter on size, preserving the old explode's drop
    semantics without putting a UDF output in a filter — guide §4.4)."""
    w_cache: dict = {}

    @pandas_udf("long")
    def fold(us: pd.Series) -> pd.Series:
        p1 = np.arange(1, planes + 1, dtype=np.int64)
        shifts = np.arange(planes, dtype=np.int64)

        def weights(dim: int) -> np.ndarray:
            W = w_cache.get(dim)
            if W is None:
                i = np.arange(1, dim + 1, dtype=np.int64)
                W = (i[:, None] * 2654435761 + p1[None, :] * 40503) % 97 - 48
                w_cache[dim] = W
            return W

        vals = us.to_numpy()
        lens = np.asarray([len(r) if r is not None else 0 for r in vals])
        if len(lens) and lens.min() == lens.max() and lens[0] > 0:
            U = np.vstack(vals).astype(np.int64)
            sums = U @ weights(U.shape[1])
            return pd.Series(
                ((sums >= 0).astype(np.int64) << shifts).sum(axis=1)
            )
        out = []
        for r in vals:
            if r is None or len(r) == 0:
                out.append(None)
                continue
            u = np.asarray(r, dtype=np.int64)
            s = u @ weights(len(u))
            out.append(int(((s >= 0).astype(np.int64) << shifts).sum()))
        return pd.Series(out, dtype="object")

    return fold


def portable_srp_bucket_col(vec_col, planes: int = 8):
    """Per-row COLUMN form of the portable SRP bucket (r10): the same
    plane weights and the same 6-rounded DECIMAL(18,6) dot-product
    components as the old explode(dim x planes) + two-keyed-aggregation
    form, bit-identical buckets, zero shuffle. A JVM ``transform`` scales
    each rounded component to its exact integer micro-units (Spark's own
    ROUND stays the rounding authority — decimal(18,6) x 10^6 is an
    exact integer), then an Arrow numpy pass folds all plane dot
    products per row (`_srp_bucket_fold_udf` — the simhash-portable
    pattern). NULL/empty vectors fold to NULL; callers filter
    ``size(vec) > 0`` to reproduce the explode form's drop semantics."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # coalesce NULL elements to 0 micro-units: the old explode+SUM form
    # silently SKIPPED NULL terms (SUM ignores NULLs == adding 0), and an
    # un-coalesced None reaching the numpy fold would TypeError in
    # vstack/astype (ADVICE r10) — 0 keeps the fold value-identical
    units = F.transform(
        v,
        lambda e: F.coalesce(
            (
                F.round(e.cast("double"), 6).cast("decimal(18,6)") * 1000000
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
    )
    return _srp_bucket_fold_udf(planes)(units)


def portable_srp_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
) -> DataFrame:
    """(_id, bucket) — SRP sign-bit buckets from PORTABLE hyperplanes.

    Plane p, dimension i (1-based) has integer weight
    ``((i * 2654435761 + (p+1) * 40503) % 97) - 48``; each dot product
    is an exact DECIMAL(18,6) sum of 6-rounded components, so the sign
    bits — and hence the bucket id — are bit-reproducible in any engine
    (the oracle-expressible trade: plane quality is mildly worse than
    the seeded-RNG planes of `_srp_buckets_udf`, which remain the
    production tier). Since r10 the dot products fold PER ROW
    (`portable_srp_bucket_col`) — no explode, no shuffle, values
    bit-identical; ids with NULL/empty vectors are dropped exactly as
    the old explode form dropped them (the size filter sits on the
    INPUT, so it pushes to the scan instead of gating a UDF output)."""
    return df.where(F.size(F.col(vec_col)) > 0).select(
        F.col(id_col).alias("_id"),
        portable_srp_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )


def ivf_topk_srp(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k with a PORTABLE SRP coarse quantizer — the
    oracle-expressible member of the IVF family (`ivf_topk` keeps the
    sampled-kmeans cells as the recall-tuned production tier).

    The inverted file is keyed on the 2^planes SRP cells of
    `portable_srp_buckets` instead of kmeans centroids; each query probes
    its own cell plus every Hamming-1 neighbor (flip one sign bit —
    exactly the cells on the far side of ONE hyperplane, the SRP analog
    of kmeans' next-nearest centroids), so `n_probe = planes + 1` of
    2^planes cells (5/16 at the default — ~31% of brute-force work per
    query). Because cell assignment is integer arithmetic over exact
    DECIMAL dot products, the probed candidate set — and therefore the
    approximate result itself — is bit-reproducible in SQL.

    Same scale shape as `ivf_topk`: the corpus shuffles once by cell,
    probed queries explode planes+1 rows and join on the cell key; exact
    cosine re-rank; per-query window top-k. A candidate's cell is unique,
    so multi-probe never duplicates a candidate."""
    from ..functions.vectors import cosine_pairs

    if planes == 0:
        # degenerate single-cell file: exact brute force (pinned in tests)
        bucket_of = lambda _v: F.lit(0).cast("bigint")  # noqa: E731
    else:
        # r10: the bucket is a per-row exact-decimal fold now — attach it
        # as a COLUMN on each side instead of joining a separately
        # aggregated (id, bucket) frame back by id (two shuffle joins and
        # an explode-heavy aggregation removed; values bit-identical, see
        # portable_srp_bucket_col)
        bucket_of = lambda v: portable_srp_bucket_col(v, planes)  # noqa: E731
    masks = F.array(F.lit(0), *[F.lit(1 << j) for j in range(planes)])
    c = corpus.where(F.size(F.col(vec_col)) > 0).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        bucket_of(F.col(vec_col)).alias("bucket"),
    )
    q = (
        queries.where(F.size(F.col(vec_col)) > 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            bucket_of(F.col(vec_col)).alias("bucket"),
        )
        .withColumn("probe", F.explode(masks))
        .select(
            "query_id",
            "qvec",
            F.col("bucket").bitwiseXOR(F.col("probe")).alias("cell"),
        )
    )
    scored = (
        c.withColumnRenamed("bucket", "cell")
        .join(q, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim0", cosine_pairs(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim0").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim0"), 6).alias("sim"),
        )
    )


def lsh_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH approximate top-k over PORTABLE SRP buckets — the
    oracle-expressible twin of `lsh_topk`: candidates are the corpus
    vectors sharing the query's bucket (recall < 1 by design, the LSH
    trade), ranked by exact cosine. Because `portable_srp_buckets` is
    bit-reproducible, the ENTIRE result — candidate set included — can
    be replayed as SQL, giving the ANN-LSH shape a value-hashed driver
    verdict. One bucket equi-join, vectorized cosine verify,
    per-query window top-k."""
    from ..functions.vectors import cosine_pairs

    cb = portable_srp_buckets(corpus, id_col, vec_col, planes)
    qb = portable_srp_buckets(queries, id_col, vec_col, planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).join(cb.withColumnRenamed("_id", "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).join(qb.withColumnRenamed("_id", "query_id"), "query_id")
    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim0", cosine_pairs(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim0").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim0"), 6).alias("sim"),
        )
    )


# nDCG@10 discount table as scale-6 integer LITERALS (1e6/log2(i+1),
# half-up): binary relevance makes DCG a pure integer dot product with
# this table, so the metric needs NO transcendental in either engine —
# the whole evaluation replays exactly. IDCG is the table's prefix sum
# indexed by min(n_rel, 10).
NDCG_DISC_E6 = [
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
]
NDCG_IDCG_PREFIX_E6 = [0]
for _d in NDCG_DISC_E6:
    NDCG_IDCG_PREFIX_E6.append(NDCG_IDCG_PREFIX_E6[-1] + _d)
del _d


def retrieval_ndcg(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact nDCG@k of the brute-force cosine ranking against
    label-match relevance — the retrieval-quality metric a corpus team
    tracks when swapping embedding models or ANN tiers. Binary relevance
    + the literal discount table turn DCG into an integer sum
    (``sum(rel_i * disc_e6[i])``) and IDCG into a prefix-table lookup at
    ``min(n_rel, k)`` — both BIGINT, both SQL-replayable; report the
    (dcg_e6, idcg_e6) pair, never the quotient (the hash rule).

    Scale shape: ranking reuses the blocked-matmul top-k (one Arrow
    batch matmul per partition, partial top-k — no all-pairs shuffle);
    relevance counts are one label-keyed agg broadcast back."""
    if k != len(NDCG_DISC_E6):
        raise ValueError("discount table is pinned at k=10")
    ql = queries.join(
        emb.select(
            F.col(id_col).alias("query_id"), F.col(label_col).alias("ql")
        ),
        "query_id",
    )
    top = cosine_topk_blocked(emb, queries, k=k, query_id_col="query_id")
    nl = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    disc = F.element_at(
        F.array(*[F.lit(d) for d in NDCG_DISC_E6]), F.col("rank").cast("int")
    )
    dcg = (
        top.join(F.broadcast(nl), "neighbor_id")
        .join(F.broadcast(ql.select("query_id", "ql")), "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("nl") == F.col("ql"), disc).otherwise(0)
            )
            .cast("long")
            .alias("dcg_e6")
        )
    )
    sizes = emb.groupBy(F.col(label_col).alias("ql")).agg(
        F.count(F.lit(1)).cast("long").alias("n_label")
    )
    pre = F.array(*[F.lit(p) for p in NDCG_IDCG_PREFIX_E6])
    out = (
        ql.join(F.broadcast(sizes), "ql")
        .select(
            "query_id",
            (F.col("n_label") - 1).cast("long").alias("n_rel"),
        )
        .join(dcg, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("dcg_e6", F.lit(0)).cast("long").alias("dcg_e6"),
            F.element_at(
                pre,
                (F.least(F.col("n_rel"), F.lit(k)) + 1).cast("int"),
            )
            .cast("long")
            .alias("idcg_e6"),
        )
    )
    return out
