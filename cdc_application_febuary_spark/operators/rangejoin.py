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

    ``bucket_width`` defaults to the 75th-percentile interval length —
    one small aggregate job; pass it explicitly in production to pin the
    plan.
    """
    lo_inc, hi_inc = _CLOSED[closed]
    on = list(on or [])
    if bucket_width is None:
        bucket_width = (
            intervals.select(
                F.percentile_approx(
                    F.col(end_col) - F.col(start_col), F.lit(0.75)
                ).alias("w")
            ).first()["w"]
            or 1
        )
        bucket_width = max(float(bucket_width), 1e-9)

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
