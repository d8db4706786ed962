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

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine


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


def srp_bucket(vec_col, dim: int, planes: int = 8):
    """Signed-random-projection bucket id (0..2^planes-1) as a column."""
    acc = F.lit(0)
    for p in range(planes):
        coeffs = _srp_plane(p, dim)
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
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by SRP signature, rank
    only within the query's bucket(s). Corpus side is one narrow projection —
    bucketing is a map-side expression, and the join is an equi-join on
    (bucket), so the corpus shuffles once by bucket instead of replicating
    per query.

    ``probes=1`` is multi-probe: each query also searches the `planes`
    buckets at hamming distance 1 from its own (a near neighbor on the far
    side of one hyperplane lands there). Candidate volume grows ~(planes+1)x
    on the query side only; the corpus bucketing is unchanged."""
    parts = corpus.sparkSession.sparkContext.defaultParallelism
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        srp_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    ).repartition(parts, "bucket")
    q_base = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        srp_bucket(F.col(vec_col), dim, planes).alias("bucket0"),
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
            "query_id", "qvec", F.explode(flips).alias("bucket")
        )
    else:
        q_base = q_base.withColumnRenamed("bucket0", "bucket")
    qb = F.broadcast(q_base)
    scored = (
        cb.join(qb, (cb.bucket == qb.bucket) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
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
