"""Distributed document-quality classification: logistic regression by
declarative gradient descent, plus a rank-based (Mann–Whitney) AUC.

A 100 TB corpus-quality pass cannot ship rows to a trainer; it ships
*sufficient statistics*. Each GD iteration here is ONE DataFrame
aggregation: the current weight vector enters the plan as literals, the
margin `w·x + b` is a column expression (whole-stage codegen, no UDF),
and the gradient is d+1 partial SUMs — map-side combined, so per
iteration the driver receives d+1 doubles regardless of corpus size.
This is the same sufficient-statistics shape as MLlib's
``treeAggregate`` LBFGS, expressed through Catalyst instead of RDDs
(cf. Spark's own LogisticRegression cost aggregator).

Features are standardized first (one additional scan: mean/std per
feature) — both for conditioning and so learned weights are comparable
across features. The AUC is the Mann–Whitney statistic computed from
average ranks of the positive class: a global sort-free ranking via the
partition-offset trick (`operators/ranking`-style) would also work, but
AUC needs only per-score group counts, so it reduces to one groupBy and
a running cumulative sum — exact, including tie handling, with no
per-row window over a single partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window, functions as F


@dataclass
class LogRegModel:
    feature_cols: list[str]
    means: list[float]
    stds: list[float]
    weights: list[float]  # standardized-space weights
    bias: float
    losses: list[float]   # mean log-loss per iteration (first = initial)

    def margin_col(self):
        """`w·x_standardized + b` as a column expression over the ORIGINAL
        feature columns (standardization folded in)."""
        m = F.lit(self.bias)
        for c, mu, sd, w in zip(
            self.feature_cols, self.means, self.stds, self.weights
        ):
            m = m + F.lit(w) * ((F.col(c) - F.lit(mu)) / F.lit(sd))
        return m

    def proba_col(self):
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-self.margin_col()))


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    tol: float = 0.0,
) -> LogRegModel:
    """Batch gradient descent, one aggregation scan per iteration.

    The label must be 0/1. Returns standardized-space weights plus the
    fold-in constants, so scoring is a pure column expression. ``l2``
    regularizes weights (not the bias). ``tol`` > 0 stops early once the
    mean log-loss improves by less than ``tol`` between iterations —
    each iteration is a full Spark job, so on converged problems this is
    pure scheduling overhead saved (determinism is preserved: the stop
    depends only on the loss sequence). Deterministic up to float-sum
    order; round scored outputs before hashing them across engines."""
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    stats = feats.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.avg(c).alias(f"m_{c}") for c in feature_cols],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in feature_cols],
    ).first()
    n = float(stats["__n"])
    means = [float(stats[f"m_{c}"]) for c in feature_cols]
    stds = [
        float(stats[f"s_{c}"]) if stats[f"s_{c}"] else 1.0
        for c in feature_cols
    ]
    std_cols = [
        ((F.col(c) - F.lit(mu)) / F.lit(sd)).alias(f"z_{i}")
        for i, (c, mu, sd) in enumerate(zip(feature_cols, means, stds))
    ]
    z = feats.select(*std_cols, "__y")
    z.persist()
    try:
        d = len(feature_cols)
        w = [0.0] * d
        b = 0.0
        losses: list[float] = []
        for _ in range(iters):
            margin = F.lit(b)
            for j in range(d):
                margin = margin + F.lit(w[j]) * F.col(f"z_{j}")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            # log-loss via the numerically-stable softplus form:
            # loss = softplus(margin) - y*margin
            loss = (
                F.when(margin > 30, margin)
                .when(margin < -30, F.lit(0.0))
                .otherwise(F.log1p(F.exp(margin)))
                - F.col("__y") * margin
            )
            err = (p - F.col("__y")).alias("__e")
            row = z.select(err, loss.alias("__l"), *[F.col(f"z_{j}") for j in range(d)]).agg(
                F.avg("__l").alias("loss"),
                F.sum("__e").alias("g_b"),
                *[
                    F.sum(F.col("__e") * F.col(f"z_{j}")).alias(f"g_{j}")
                    for j in range(d)
                ],
            ).first()
            losses.append(float(row["loss"]))
            b -= lr * float(row["g_b"]) / n
            for j in range(d):
                grad = float(row[f"g_{j}"]) / n + l2 * w[j]
                w[j] -= lr * grad
            if (
                tol > 0
                and len(losses) >= 2
                and losses[-2] - losses[-1] < tol
            ):
                break
        return LogRegModel(
            feature_cols=list(feature_cols),
            means=means,
            stds=stds,
            weights=w,
            bias=b,
            losses=losses,
        )
    finally:
        z.unpersist()


def auc_score(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC as the Mann–Whitney U statistic, tie-corrected.

    Reduction: group rows by score (ties collapse to one group with
    positive/total counts), cumulative-sum group totals in score order to
    get each group's average rank, then
    ``AUC = (Σ_pos avg_rank − n_pos(n_pos+1)/2) / (n_pos · n_neg)``.
    The only ordered pass runs over DISTINCT SCORES (already reduced —
    thousands of groups, not corpus rows), so the single-partition window
    is over group rows; at extreme cardinality, bucket scores first or
    swap in the partition-offset ranking. Returns a 1-row DataFrame
    (auc, n_pos, n_neg, n_score_groups)."""
    g = (
        df.select(
            F.col(score_col).cast("double").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").alias("pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "s",
        "cnt",
        "pos",
        (
            F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + (F.col("cnt") + F.lit(1)) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    return ranked.agg(
        F.sum("pos").alias("__np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("__nn"),
        F.sum(F.col("pos") * F.col("avg_rank")).alias("__rs"),
        F.count(F.lit(1)).alias("n_score_groups"),
    ).select(
        F.round(
            (F.col("__rs") - F.col("__np") * (F.col("__np") + 1) / 2.0)
            / (F.col("__np") * F.col("__nn")),
            6,
        ).alias("auc"),
        F.col("__np").cast("long").alias("n_pos"),
        F.col("__nn").cast("long").alias("n_neg"),
        F.col("n_score_groups").cast("long").alias("n_score_groups"),
    )


def bucketed_auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """The 100 TB path `auc_score` documents: quantile-bucket the scores
    FIRST (exact ANSI NTILE via the partition-offset plan — no
    single-partition pass over rows), then tie-corrected Mann–Whitney AUC
    over the bucket indices. The only unpartitioned window runs over
    ``n_buckets`` rows.

    All rank algebra stays in BIGINT (``2*rank_sum`` trick) and the AUC is
    one final division of two exact integers — IEEE-identical across
    engines, so it is hash-safe without ROUND (CLAUDE.md rule). Ordering
    inside NTILE is made total with ``tiebreak_col``, which both engines
    must use identically. Returns (auc, n_pos, n_neg, n_buckets).
    """
    from .ranking import scalable_ntile

    tiled = scalable_ntile(
        df.select(
            F.col(score_col).alias("__s"),
            F.col(tiebreak_col).alias("__t"),
            F.col(label_col).cast("long").alias("__y"),
        ),
        n_buckets,
        ["__s", "__t"],
        out_col="__b",
    )
    g = tiled.groupBy("__b").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("__y").alias("pos")
    )
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    # 2*rank_sum of positives = sum_b pos_b * (2*cum_before_b + cnt_b + 1)
    ranked = g.select(
        "cnt",
        "pos",
        (
            F.col("pos")
            * (
                F.lit(2) * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + F.lit(1)
            )
        ).alias("rs2"),
    )
    return ranked.agg(
        F.sum("pos").alias("__np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("__nn"),
        F.sum("rs2").alias("__rs2"),
    ).select(
        (
            (F.col("__rs2") - F.col("__np") * (F.col("__np") + 1)).cast(
                "double"
            )
            / (F.lit(2) * F.col("__np") * F.col("__nn")).cast("double")
        ).alias("auc"),
        F.col("__np").cast("long").alias("n_pos"),
        F.col("__nn").cast("long").alias("n_neg"),
        F.lit(n_buckets).cast("long").alias("n_buckets"),
    )


def mutual_information(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """Exact mutual information between two categorical columns (nats):
    ``MI = sum_xy p(x,y) * ln(p(x,y) / (p(x)*p(y)))`` — the standard
    feature-dependence screen before training (alongside
    :func:`auc_score` for label power).

    One grouped count over the data (map-side combined, shuffle bounded
    by the distinct pair count), then marginals/total as window sums over
    the tiny joint table — the raw data is scanned ONCE. Scales like any
    keyed count at 100 TB; the windows run over |A|x|B| rows, not data.
    """
    joint = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("nxy"))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wt = Window.partitionBy()
    terms = (
        joint.withColumn("nx", F.sum("nxy").over(wa))
        .withColumn("ny", F.sum("nxy").over(wb))
        .withColumn("n", F.sum("nxy").over(wt))
        .select(
            (
                (F.col("nxy") / F.col("n"))
                * F.log(
                    (F.col("nxy") * F.col("n"))
                    / (F.col("nx") * F.col("ny"))
                )
            ).alias("term"),
            F.lit(1).alias("pairs"),
        )
    )
    return terms.agg(
        F.round(F.sum("term"), round_to).alias("mi_nats"),
        F.sum("pairs").cast("long").alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# Fixed-point integer GD (the pagerank_fixedpoint treatment, VERDICT r6):
# every quantity in the training loop is a BIGINT, every op is integer
# add/mul/div, so the ENTIRE fit — standardization, 8 gradient steps,
# final margins — is bit-reproducible and replays as an unrolled SQL CTE
# chain. The sigmoid is the HARD sigmoid clamp(1/2 + m/4, 0, 1) (the
# standard integer-friendly surrogate from the quantized-training
# literature, e.g. Courbariaux et al. 2015); the tracked loss is the
# Brier score (sum of squared e6 errors — exact in int64).
# ---------------------------------------------------------------------------
def _tdiv(a: Column, b: Column | int) -> Column:
    """Integer division truncating toward zero on BOTH engines: Spark's
    `div` already truncates; DuckDB's `//` floors, so SQL replays must
    use CASE WHEN a >= 0 THEN a // b ELSE -((-a) // b) END (see
    `queries/pipeline_ops._tdiv_sql`). Divisors here are always > 0.

    Implemented as (a - a % b) / b: Spark's % takes the dividend's sign
    (Java semantics), so the numerator is exactly divisible and the
    double division is exact below 2^53 — well above every magnitude in
    this loop (gradient sums stay < 1e15 by the documented headroom)."""
    bb = F.lit(b) if isinstance(b, int) else b
    aa = a.cast("long")
    return ((aa - aa % bb) / bb).cast("long")


@dataclass
class LogRegFixedPoint:
    feature_cols: list[str]
    means: list[int]          # integer feature means (sum div n)
    scales: list[int]         # floor(sqrt(var)) + 1 per feature
    weights_e6: list[int]     # weights in 1e-6 units
    bias_e6: int
    n: int
    brier_e12_sums: list[int]  # sum of squared e6 errors per iteration

    def zq_col(self, j: int) -> Column:
        """Quantized standardized feature: (16*(x - mean)) tdiv scale —
        an integer in ~[-48, 48] (units of 1/16 std)."""
        z = (F.col(self.feature_cols[j]).cast("long") - F.lit(self.means[j])) * 16
        return _tdiv(z, self.scales[j])

    def margin16_col(self) -> Column:
        """Integer margin in units of 1e-6/16: 16*b + sum w_j * zq_j."""
        m = F.lit(16 * self.bias_e6).cast("long")
        for j in range(len(self.feature_cols)):
            m = m + F.lit(self.weights_e6[j]) * self.zq_col(j)
        return m


def fit_logreg_fixedpoint(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    lr_shift: int = 2,
) -> LogRegFixedPoint:
    """Hard-sigmoid logistic regression by EXACT fixed-point integer GD.

    Inputs must be integer-valued columns (counts — the caller derives
    them identically in the SQL replay). Pipeline, all BIGINT:

    * mean_j = sum(x_j) div n; scale_j = floor(sqrt((sum (x-mean)^2)
      div n)) + 1; zq_j = (16*(x_j - mean_j)) tdiv scale_j
    * margin m16 = 16*b_e6 + sum w_e6_j * zq_j (units 1e-6/16)
    * p_e6 = clamp(500000 + m16 tdiv 64, 0, 1000000) — hard sigmoid
    * err_e6 = p_e6 - 1000000*y;  brier += err_e6^2
    * w_j -= (sum err_e6*zq_j) tdiv (n << (4 + lr_shift));
      b   -= (sum err_e6) tdiv (n << lr_shift)

    One aggregation job per iteration (d+2 partial sums — sufficient
    statistics, same shape as `fit_logreg`), driver receives d+2 ints.
    Deterministic under ANY partitioning: int64 sums are
    order-independent. Overflow headroom: |err|<=1e6, |zq|<=~64, so the
    gradient sum is < 6.4e7 * n and brier < 1e12 * n — safe in int64
    beyond 1e6 rows; at larger n, pre-aggregate per partition or raise
    the scale to 1e-4 units."""
    d = len(feature_cols)
    feats = df.select(
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("__y"),
    )
    s0 = feats.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"sum_{c}") for c in feature_cols],
    ).first()
    n = int(s0["__n"])
    means = [int(s0[f"sum_{c}"]) // n for c in feature_cols]  # sums >= 0
    s1 = feats.agg(
        *[
            F.sum(
                (F.col(c) - F.lit(means[j])) * (F.col(c) - F.lit(means[j]))
            ).alias(f"ss_{j}")
            for j, c in enumerate(feature_cols)
        ]
    ).first()
    import math

    scales = [math.isqrt(int(s1[f"ss_{j}"]) // n) + 1 for j in range(d)]
    zq = feats.select(
        "__y",
        *[
            _tdiv((F.col(c) - F.lit(means[j])) * 16, scales[j]).alias(f"zq_{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    zq.persist()
    try:
        w = [0] * d
        b = 0
        briers: list[int] = []
        for _ in range(iters):
            m16 = F.lit(16 * b).cast("long")
            for j in range(d):
                m16 = m16 + F.lit(w[j]) * F.col(f"zq_{j}")
            p = F.greatest(
                F.least(
                    F.lit(500000).cast("long") + _tdiv(m16, 64),
                    F.lit(1000000).cast("long"),
                ),
                F.lit(0).cast("long"),
            )
            err = (p - F.lit(1000000) * F.col("__y")).alias("__e")
            row = zq.select(
                err, *[F.col(f"zq_{j}") for j in range(d)]
            ).agg(
                F.sum(F.col("__e") * F.col("__e")).alias("brier"),
                F.sum("__e").alias("g_b"),
                *[
                    F.sum(F.col("__e") * F.col(f"zq_{j}")).alias(f"g_{j}")
                    for j in range(d)
                ],
            ).first()
            briers.append(int(row["brier"]))
            b -= _py_tdiv(int(row["g_b"]), n << lr_shift)
            for j in range(d):
                w[j] -= _py_tdiv(int(row[f"g_{j}"]), n << (4 + lr_shift))
        return LogRegFixedPoint(
            feature_cols=list(feature_cols),
            means=means,
            scales=scales,
            weights_e6=w,
            bias_e6=b,
            n=n,
            brier_e12_sums=briers,
        )
    finally:
        zq.unpersist()


def _py_tdiv(a: int, b: int) -> int:
    """Python // floors; the engine contract truncates toward zero."""
    return -((-a) // b) if a < 0 else a // b


def auc_exact_pair(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Mann–Whitney AUC over INTEGER scores as an exact rational:
    auc = auc_num / auc_den with auc_num = 2*Σ_pos avg_rank −
    n_pos*(n_pos+1) and auc_den = 2*n_pos*n_neg (avg ranks over tied
    integer scores are half-integers, so 2*avg_rank is an integer and
    the pair is exact — no float division reaches the output)."""
    g = (
        df.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "pos",
        "cnt",
        (
            F.lit(2) * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + F.lit(1)
        ).alias("avg_rank2"),
    )
    return ranked.agg(
        F.sum("pos").alias("__np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("__nn"),
        F.sum(F.col("pos") * F.col("avg_rank2")).alias("__rs2"),
    ).select(
        (F.col("__rs2") - F.col("__np") * (F.col("__np") + 1))
        .cast("long")
        .alias("auc_num"),
        (F.lit(2) * F.col("__np") * F.col("__nn")).cast("long").alias("auc_den"),
        F.col("__np").cast("long").alias("n_pos"),
        F.col("__nn").cast("long").alias("n_neg"),
    )
