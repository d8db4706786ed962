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
    time ordering reversed. ``inclusive`` controls whether an
    equal-timestamp right row matches; equal-timestamp ordering is
    resolved by sorting the right row before (inclusive) or after
    (exclusive) the left row."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
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
