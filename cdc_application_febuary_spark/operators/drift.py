"""Schema drift detection (reference `backend/ingestion/data_quality.py:117-211`):
diff a captured baseline StructType against the currently-observed schema and
classify added / removed / type-modified / nullability-modified columns."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


@dataclass
class ColumnChange:
    column: str
    kind: str  # added | removed | type_changed | nullability_changed
    before: str | None = None
    after: str | None = None


def diff_schemas(baseline: StructType, observed: StructType) -> list[ColumnChange]:
    b = {f.name: f for f in baseline.fields}
    o = {f.name: f for f in observed.fields}
    changes: list[ColumnChange] = []
    for name in sorted(set(o) - set(b)):
        changes.append(ColumnChange(name, "added", None, o[name].dataType.simpleString()))
    for name in sorted(set(b) - set(o)):
        changes.append(ColumnChange(name, "removed", b[name].dataType.simpleString(), None))
    for name in sorted(set(b) & set(o)):
        bt, ot = b[name].dataType.simpleString(), o[name].dataType.simpleString()
        if bt != ot:
            changes.append(ColumnChange(name, "type_changed", bt, ot))
        elif b[name].nullable != o[name].nullable:
            changes.append(
                ColumnChange(
                    name,
                    "nullability_changed",
                    str(b[name].nullable),
                    str(o[name].nullable),
                )
            )
    return changes


def has_drift(baseline: StructType, observed: StructType) -> bool:
    return bool(diff_schemas(baseline, observed))


def value_drift(
    baseline: DataFrame,
    observed: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index per histogram bucket between a baseline
    and an observed dataset — the standard drift alarm for a CDC target's
    value distribution (schema drift is ``diff_schemas``; this is the data
    twin).

    Fixed, caller-supplied bucket edges (not quantiles) so the measure is
    deterministic and the two sides can be scanned INDEPENDENTLY — each
    side is one partial-aggregated bucket count (map-side combine, one
    tiny shuffle of <= n_buckets+2 rows per side), then a broadcast-sized
    join of the two histograms. Values outside [lo, hi) land in underflow
    (bucket 0) / overflow (bucket n+1) like width_bucket defines.

    psi_term = (p - q) * ln(p / q) with eps-smoothed shares; the total PSI
    is SUM(psi_term) (>0.2 conventionally = action). Emitted per bucket so
    the alarm can say WHERE the distribution moved.
    """

    def hist(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(n_buckets)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(f"n_{name}"))
        )

    a, b = hist(baseline, "base"), hist(observed, "obs")
    joined = a.join(b, "bucket", "full").select(
        F.col("bucket").cast("int").alias("bucket"),
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
    )
    # Totals via an unpartitioned window: the input here is the joined
    # HISTOGRAM (<= n_buckets+2 rows), so single-partition window state is
    # trivially bounded — and the plan stays BroadcastNestedLoopJoin-free.
    from pyspark.sql import Window

    whole = Window.partitionBy()
    joined = joined.withColumn("tb", F.sum("n_base").over(whole)).withColumn(
        "to", F.sum("n_obs").over(whole)
    )
    return (
        joined
        .select(
            "bucket",
            "n_base",
            "n_obs",
            (F.col("n_base") / F.col("tb") + F.lit(eps)).alias("__p"),
            (F.col("n_obs") / F.col("to") + F.lit(eps)).alias("__q"),
        )
        .select(
            "bucket",
            "n_base",
            "n_obs",
            F.round(
                (F.col("__p") - F.col("__q")) * F.log(F.col("__p") / F.col("__q")),
                round_to,
            ).alias("psi_term"),
        )
    )


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    n_buckets: int = 8,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-DIMENSION Population Stability Index between two embedding
    populations — the vector-column twin of :func:`value_drift`, the
    monitor that catches an embedding model/version swap or a feature
    collapse before the ANN tier's recall quietly decays.

    Bucketing is the EXPLICIT portable expression
    ``least(greatest(floor((v + 1.0) * n/2), 0), n-1)`` over [-1, 1)
    (unit-ish embedding coordinates) rather than ``width_bucket`` — every
    step (float->double cast, add, multiply, floor) is a correctly-
    rounded IEEE op with a fixed evaluation order, so bucket ids are
    bit-identical in Spark and any SQL oracle. PSI terms follow the
    LM/BM25 libm discipline: each eps-smoothed (p-q)*ln(p/q) rounds to
    DECIMAL(18,6) BEFORE the per-dim sum, so the sum is exact and
    order-independent; the report emits it as a scale-6 BIGINT
    (``psi_e6``) because decimal->double casts are NOT correctly
    rounded in every engine (the r6 ADVICE rule).

    Scale shape: one explode per side (rows x dims terms), ONE combined
    groupBy (dim, bucket) with conditional counts — the histogram is
    dims x buckets rows regardless of input size — then a window over
    dim for totals. Nothing corpus-sized ever joins."""
    from pyspark.sql import Window

    half = float(n_buckets) / 2.0

    def side(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("side"),
            F.posexplode_outer(F.col(vec_col)).alias("dim", "v"),
        ).where(F.col("v").isNotNull())

    both = side(ref, "ref").unionByName(side(cur, "cur"))
    bucket = F.least(
        F.greatest(
            F.floor((F.col("v").cast("double") + F.lit(1.0)) * F.lit(half))
            .cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    hist = (
        both.select("side", "dim", bucket.alias("bucket"))
        .groupBy("dim", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == "ref", 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("side") == "cur", 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
    )
    wd = Window.partitionBy("dim")
    hist = hist.withColumn("tr", F.sum("n_ref").over(wd)).withColumn(
        "tc", F.sum("n_cur").over(wd)
    )
    # Empty-population short-circuit (the url_domain_dedup empty-list rule):
    # tr/tc == 0 would make n/total NULL in Spark but is double 0/0 = NaN or
    # an error in other engines — pin both sides to the bare eps term instead.
    p = F.when(F.col("tr") == 0, F.lit(eps)).otherwise(
        F.col("n_ref") / F.col("tr") + F.lit(eps)
    )
    q = F.when(F.col("tc") == 0, F.lit(eps)).otherwise(
        F.col("n_cur") / F.col("tc") + F.lit(eps)
    )
    term = (
        F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)").alias("term")
    )
    return (
        hist.select("dim", "tr", "tc", term)
        .groupBy("dim")
        .agg(
            F.max("tr").cast("long").alias("n_ref"),
            F.max("tc").cast("long").alias("n_cur"),
            (F.sum("term") * 1_000_000).cast("long").alias("psi_e6"),
        )
    )
