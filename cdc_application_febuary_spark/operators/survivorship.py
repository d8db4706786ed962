"""Golden-record survivorship: merge an entity's event/record history into
ONE best row, column by column, each column under its own rule — the MDM
"survivorship" step that follows dedup clustering (the reference's CDC
targets stop at latest-row-wins SCD2; a training-data pipeline also needs
per-column merge when consolidating user/entity profiles).

Rules (all expressible as one grouped aggregation — no self-joins):

* ``latest(col, order)``  — value from the row with the max order key
  (``max_by`` with a deterministic tiebreak).
* ``earliest(col, order)`` — same with min.
* ``most_frequent(col)``  — modal value; ties break to the SMALLEST value
  so the result is partitioning-invariant.
* plain aggregates (count, sum, min, max) ride along.

Everything is a single ``groupBy(entity)`` — one shuffle on the entity
key, map-side combined, no window over the raw rows — so it scales to
100 TB the same way any keyed aggregation does. ``most_frequent`` costs
one extra (entity, value) pre-aggregation, still shuffle-bounded by the
distinct pair count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def latest(value_col: str, order_cols: list[str]) -> Column:
    """max_by with a total order: (order..., value) struct comparison, so
    ties on the order keys resolve deterministically by the value."""
    return F.max_by(
        F.col(value_col), F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
    )


def earliest(value_col: str, order_cols: list[str]) -> Column:
    return F.min_by(
        F.col(value_col), F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
    )


def most_frequent(
    df: DataFrame, entity_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Per-entity modal value, ties to the smallest value. Two bounded
    aggregations: (entity, value) counts, then max_by on (count desc,
    value asc) — expressed as max_by over (count, negated orderable
    value) where possible; for strings we use min_by over (-count)
    ordering via struct comparison."""
    counts = df.groupBy(entity_col, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # min_by over (-cnt, value): highest count first, then smallest value
    return counts.groupBy(entity_col).agg(
        F.min_by(
            F.col(value_col), F.struct((-F.col("__cnt")).alias("nc"), F.col(value_col))
        ).alias(out_col)
    )


def golden_records(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    latest_cols: list[str] = (),
    modal_cols: list[str] = (),
    extra_aggs: list[Column] = (),
) -> DataFrame:
    """One golden row per entity: latest-rule columns, modal-rule columns,
    first/last seen on the order key, and any extra plain aggregates."""
    first_order, *_ = order_cols
    aggs: list[Column] = [
        F.min(first_order).alias("first_seen"),
        F.max(first_order).alias("last_seen"),
        F.count(F.lit(1)).alias("n_records"),
    ]
    aggs += [latest(c, list(order_cols)).alias(f"latest_{c}") for c in latest_cols]
    aggs += list(extra_aggs)
    out = df.groupBy(entity_col).agg(*aggs)
    for c in modal_cols:
        out = out.join(
            most_frequent(df, entity_col, c, f"top_{c}"), entity_col
        )
    return out
