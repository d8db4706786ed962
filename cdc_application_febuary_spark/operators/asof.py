"""As-of join — the canonical "operator Spark lacks" (SURVEY §7
beyond-reference list): for each left row, the latest right row with
``right_ts <= left_ts`` (backward direction) on the same key.

Implementation is the union-tag pattern, which is the scale-correct shape:
tag both sides, union, ONE shuffle on the key, and a running
``last(struct, ignorenulls)`` window carries the most recent right row
forward onto each left row. No join explosion, no per-key driver loops —
cost is a single sort within key partitions, identical asymptotics to a
sort-merge join.

The carried object is a single STRUCT of (timestamp, payload columns), not
per-column fills: with independent per-column ``last(value, ignorenulls)``
windows, a right row holding a NULL value column would be skipped for that
column only, so the output could stitch the winning row's timestamp to an
OLDER row's payload. The struct is non-null exactly when the row is a right
row, so the matched row's payload — nulls included — travels as one unit.

Gap comparison for ``direction='nearest'`` is exact: epoch-nanos bigint
timestamps (~1.7e18) exceed double's 2^53 integer range, so a double cast
loses up to ~256 ns per operand and can pick the farther side when the two
gaps differ by under ~0.5 µs. Integral and timestamp types compare via
DECIMAL(38,0) arithmetic; only genuinely fractional types fall back to
double.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

_TAG = "__asof_is_left"


def _exact_gap_operand(col: Column, dtype: DataType) -> Column:
    """Lossless comparable numeric for nearest-gap arithmetic."""
    if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        return col.cast("decimal(38,0)")
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col).cast("decimal(38,0)")
    if isinstance(dtype, DateType):
        return F.unix_date(col).cast("decimal(38,0)")
    return col.cast("double")


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
    if not value_cols:
        return left.select("*")

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
    is_right = F.col(_TAG) != 1
    # One struct per right row: timestamp + payload travel together, so the
    # emitted values always come from the row whose timestamp won (nulls in
    # payload columns included — ignorenulls skips left rows only, because
    # the struct itself is non-null on every right row).
    r_struct = F.when(
        is_right,
        F.struct(
            F.col("__asof_ts").alias("__ts"),
            *[F.col(f"__r_{c}").alias(c) for c in value_cols],
        ),
    )

    if direction == "nearest":
        base = Window.partitionBy(*on).orderBy(
            F.col("__asof_ts").asc(), F.col(_TAG).asc()
        )
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = unioned.select(
            "*",
            F.last(r_struct, ignorenulls=True).over(wb).alias("__b"),
            F.first(r_struct, ignorenulls=True).over(wf).alias("__f"),
        )
        ts_type = unioned.schema["__asof_ts"].dataType
        cur = _exact_gap_operand(F.col("__asof_ts"), ts_type)
        b_ts = _exact_gap_operand(F.col("__b.__ts"), ts_type)
        f_ts = _exact_gap_operand(F.col("__f.__ts"), ts_type)
        # ties (equal gap) go backward, matching pandas merge_asof
        use_back = F.col("__f").isNull() | (
            F.col("__b").isNotNull() & (cur - b_ts <= f_ts - cur)
        )
        return carried.where(F.col(_TAG) == 1).select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_back, F.col(f"__b.{c}"))
                .otherwise(F.col(f"__f.{c}"))
                .alias(c)
                for c in value_cols
            ],
        )

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
        "*", F.last(r_struct, ignorenulls=True).over(w).alias("__v")
    )
    return carried.where(F.col(_TAG) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__v.{c}").alias(c) for c in value_cols],
    )
