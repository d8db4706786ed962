"""As-of join — the canonical "operator Spark lacks" (SURVEY §7
beyond-reference list): for each left row, the latest right row with
``right_ts <= left_ts`` (backward direction) on the same key.

Implementation is the union-tag pattern, which is the scale-correct shape:
tag both sides, union, ONE shuffle on the key, and a running
``last(value, ignorenulls)`` window carries the most recent right payload
forward onto each left row. No join explosion, no per-key driver loops —
cost is a single sort within key partitions, identical asymptotics to a
sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    inclusive: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left columns + the nearest right `value_cols` in the
    given direction (null when no right row qualifies).

    ``direction='backward'`` (default) carries the latest right row with
    ``right_ts <= left_ts``; ``'forward'`` the earliest right row with
    ``right_ts >= left_ts`` — same union-tag single-shuffle plan with the
    time ordering reversed. ``'nearest'`` (pandas ``merge_asof`` parity)
    picks whichever side is closer in time, still in ONE shuffle: both a
    backward fill and a forward fill run over the same union, and a
    per-row comparison of the two gap widths chooses (ties go backward,
    matching pandas). ``inclusive`` controls whether an equal-timestamp
    right row matches; equal-timestamp ordering is resolved by sorting
    the right row before (inclusive) or after (exclusive) the left row.
    ``nearest`` requires ``inclusive=True`` (an equal-timestamp match IS
    the nearest; excluding it makes the semantics ambiguous)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    if direction == "nearest" and not inclusive:
        raise ValueError("direction='nearest' requires inclusive=True")
    value_cols = list(value_cols or [c for c in right.columns
                                     if c not in set(on) and c != right_ts])
    on = list(on)
    clash = set(value_cols) & (set(left.columns) - set(on))
    if clash:
        raise ValueError(
            "value_cols collide with non-key left columns (the output would "
            f"carry duplicate names): {sorted(clash)}; rename or alias the "
            "right-side columns before the join"
        )

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(on)],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0 if inclusive else 2).alias(_TAG),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "nearest":
        base = Window.partitionBy(*on).orderBy(
            F.col("__asof_ts").asc(), F.col(_TAG).asc()
        )
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        is_right = F.col(_TAG) != 1
        r_ts = F.when(is_right, F.col("__asof_ts"))
        carried = unioned.select(
            "*",
            F.last(r_ts, ignorenulls=True).over(wb).alias("__b_ts"),
            F.first(r_ts, ignorenulls=True).over(wf).alias("__f_ts"),
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True)
                .over(wb)
                .alias(f"__b_{c}")
                for c in value_cols
            ],
            *[
                F.first(F.col(f"__r_{c}"), ignorenulls=True)
                .over(wf)
                .alias(f"__f_{c}")
                for c in value_cols
            ],
        )
        # ties (equal gap) go backward, matching pandas merge_asof
        use_back = F.col("__f_ts").isNull() | (
            F.col("__b_ts").isNotNull()
            & (
                F.col("__asof_ts").cast("double") - F.col("__b_ts").cast("double")
                <= F.col("__f_ts").cast("double") - F.col("__asof_ts").cast("double")
            )
        )
        out = carried.where(F.col(_TAG) == 1).select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_back, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(c)
                for c in value_cols
            ],
        )
        return out

    ts_order = (
        F.col("__asof_ts").asc()
        if direction == "backward"
        else F.col("__asof_ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col(_TAG) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    return out
