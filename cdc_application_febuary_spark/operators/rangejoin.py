"""Interval (range-containment) join — points matched to every interval
that contains them, the second "operator Spark lacks" next to the as-of
join (reference analog: threshold-window checks like the lag monitor's
value-in-band classification, `cdc_health_monitor.py:24-27`, generalized
to arbitrary interval tables).

Naive Spark turns `p BETWEEN lo AND hi` into a BroadcastNestedLoopJoin —
quadratic work and a broadcast requirement on one whole side. The scale
shape used here is bucketization: pick a bucket width, explode each
interval into the buckets it covers (``sequence``), map each point to its
single bucket, equi-join on (keys..., bucket), then apply the exact
containment predicate. Each (point, interval) match is produced exactly
once — a point lives in one bucket — so no distinct pass is needed.

Cost: shuffle is linear in points + intervals x (len/width + 1); the
width dial trades interval replication against per-bucket join fan-in.
At 100 TB both sides shuffle-partition by bucket, so no side needs to fit
in memory and skew splits across buckets. A bucket spanned by many
intervals is AQE skew-join territory, same as any hot equi-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_CLOSED = {
    "both": (True, True),
    "left": (True, False),
    "right": (False, True),
    "neither": (False, False),
}


def auto_bucket_width(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
) -> float:
    """Histogram-cost bucket width.

    A quantile of interval length (the old p75 default) is an order
    statistic — it ignores where the *mass* is, so a bimodal mix of many
    short and a few very long intervals picks the short width and the
    long tail explodes into millions of buckets each. Instead, build a
    log2 histogram of interval lengths (one small aggregate, <=64 bins to
    the driver) plus point count/span (second small aggregate), and pick
    the power-of-two width minimizing the modeled candidate volume:

        cost(w) =  sum_b cnt_b * (sumlen_b/(cnt_b*w) + 1)   replication
                 + P * N * w / span                          false pairs

    The first term is the exploded interval-bucket row count (shuffle
    size); the second estimates spurious (point, interval) bucket
    collisions under a uniform-points approximation — it is what stops
    the minimizer from running to w=infinity. Total replication at the
    chosen w is bounded by cost(w*) <= cost(any w), so the long tail can
    never blow up more than the evaluated alternatives allow.
    """
    bins = (
        intervals.where(F.col(end_col) >= F.col(start_col))
        .select(
            (F.col(end_col) - F.col(start_col)).cast("double").alias("len"),
            F.col(start_col).cast("double").alias("s"),
            F.col(end_col).cast("double").alias("e"),
        )
        .groupBy(
            F.when(F.col("len") <= 0, F.lit(-1))
            .otherwise(F.floor(F.log2(F.col("len"))))
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("len").alias("sumlen"),
            F.min("s").alias("lo"),
            F.max("e").alias("hi"),
        )
        .collect()
    )
    if not bins:
        return 1.0
    pstat = points.agg(
        F.count(F.lit(1)).alias("p"),
        F.min(F.col(point_col).cast("double")).alias("lo"),
        F.max(F.col(point_col).cast("double")).alias("hi"),
    ).first()
    n = sum(r["cnt"] for r in bins)
    total_len = sum(r["sumlen"] for r in bins)
    lo = min(min(r["lo"] for r in bins), pstat["lo"] or 0.0)
    hi = max(max(r["hi"] for r in bins), pstat["hi"] or 0.0)
    span, p_cnt = hi - lo, pstat["p"]
    if total_len <= 0 or span <= 0 or p_cnt == 0:
        return max(total_len / max(n, 1), 1.0)
    k_lo = min(r["bin"] for r in bins if r["bin"] >= 0) - 2
    k_hi = max(r["bin"] for r in bins) + 3

    def cost(w: float) -> float:
        repl = sum(r["cnt"] + r["sumlen"] / w for r in bins)
        false_pairs = p_cnt * n * w / span
        return repl + false_pairs

    widths = [float(2**k) for k in range(int(k_lo), int(k_hi) + 1)]
    return min(widths, key=cost)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] | None = None,
    bucket_width: float | int | None = None,
    closed: str = "both",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose [start, end] range
    contains it, optionally also matching equi-keys ``on``.

    Columns must be numeric (cast timestamps to unix seconds/micros
    first); point and interval column names must not collide except for
    ``on`` keys. ``closed`` picks boundary semantics ('both' = BETWEEN).
    ``how`` is 'inner' or 'left' (left keeps pointless points with null
    interval columns).

    ``bucket_width`` defaults to :func:`auto_bucket_width` (two small
    aggregate jobs, histogram-cost minimization — robust to bimodal
    short/long interval mixes); pass it explicitly in production to pin
    the plan.
    """
    lo_inc, hi_inc = _CLOSED[closed]
    on = list(on or [])
    if bucket_width is None:
        bucket_width = max(
            float(
                auto_bucket_width(
                    points, intervals, point_col, start_col, end_col
                )
            ),
            1e-9,
        )

    w = F.lit(bucket_width)
    # degenerate (end < start) intervals match nothing; drop them before
    # sequence(), which would otherwise generate a DESCENDING bucket range
    intervals = intervals.where(F.col(end_col) >= F.col(start_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )

    p = F.col(f"p.{point_col}")
    cond = F.col("p.__bucket") == F.col("i.__bucket")
    for k in on:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    cond = cond & (p >= F.col(f"i.{start_col}") if lo_inc else p > F.col(f"i.{start_col}"))
    cond = cond & (p <= F.col(f"i.{end_col}") if hi_inc else p < F.col(f"i.{end_col}"))

    joined = pt.alias("p").join(iv.alias("i"), cond, how)
    out_cols = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in set(on)
    ]
    return joined.select(*out_cols)
