"""Incremental view maintenance (IVM) over a CDC changelog.

The reference materializes targets as raw SCD2 history and recomputes every
dashboard aggregate from scratch on each request (`backend/ingestion/api.py`
re-issues full GROUP BYs per call). At 100 TB the recompute is the
bottleneck: a day's changelog is GBs while the base table is TBs. IVM keeps
a groupBy aggregate continuously correct by folding only the *changes* in —
the Flink retract-stream model, expressed as plain DataFrame ops:

* insert (``c``/``r``)  -> +1 weighted after-image
* update (``u``)        -> -1 weighted before-image, +1 weighted after-image
* delete (``d``)        -> -1 weighted before-image

``SUM``/``COUNT`` (and ``AVG`` = sum/count) are self-maintainable: the
weighted union aggregates in ONE shuffle (map-side partial agg applies) and
the result merges into the running state with a key join — cost scales with
the batch + touched keys, never the base table. ``MIN``/``MAX`` are not
retractable; :func:`refresh_groups` does the standard partial recompute:
re-aggregate the base table for the *dirty groups only* and patch them in.

State is persisted as versioned snapshots (``v=<batch_id>`` directories):
each micro-batch derives ``v=N`` deterministically from ``v=N-1``, so a
replayed batch overwrites its own version — idempotent exactly-once without
a transactional table format. (With Delta/Iceberg available, swap the
snapshot write for a MERGE; the delta math is unchanged.)

Sums route through ``DECIMAL(18,2)``: decimal addition is exact and
commutative, so the incrementally-maintained total is bit-identical to a
full recompute — double sums would drift by accumulation order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.changelog import DELETE_CODES, INSERT_CODES, UPDATE_CODES

_W = "__ivm_w"


def aggregate_deltas(
    changelog: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
    decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Per-group aggregate deltas for one changelog batch.

    ``group_cols`` and ``measure_cols`` name fields *inside* the
    ``before``/``after`` image structs. Returns one row per touched group:
    ``cnt_delta`` (net row count, may be negative) and ``<m>_delta`` (net
    exact-decimal sum) per measure. One union + one shuffle.
    """
    group_cols, measure_cols = list(group_cols), list(measure_cols)
    lop = F.lower(F.col(op_col))

    def image(col: str, weight: int, ops: tuple[str, ...]) -> DataFrame:
        return changelog.where(lop.isin(*ops)).select(
            *[F.col(f"{col}.{g}").alias(g) for g in group_cols],
            *[
                F.col(f"{col}.{m}").cast(decimal).alias(m)
                for m in measure_cols
            ],
            F.lit(weight).alias(_W),
        )

    plus = image(after_col, 1, INSERT_CODES + UPDATE_CODES)
    minus = image(before_col, -1, UPDATE_CODES + DELETE_CODES)
    return (
        plus.unionByName(minus)
        .groupBy(*group_cols)
        .agg(
            F.sum(_W).alias("cnt_delta"),
            *[
                F.sum(F.col(m) * F.col(_W)).cast(decimal).alias(f"{m}_delta")
                for m in measure_cols
            ],
        )
    )


def merge_state(
    state: DataFrame | None,
    deltas: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
    decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Fold a delta batch into the running aggregate state.

    State schema: ``group_cols + cnt + <m>_sum``. Full-outer key join
    (state-sized, bucketable at scale), add counts/sums, drop groups whose
    net count reaches zero — a group fully deleted leaves no residue row.
    ``state=None`` bootstraps from the deltas alone.
    """
    group_cols, measure_cols = list(group_cols), list(measure_cols)
    zero = F.lit(0).cast("long")

    if state is None:
        folded = deltas.select(
            *group_cols,
            F.col("cnt_delta").alias("cnt"),
            *[
                F.col(f"{m}_delta").cast(decimal).alias(f"{m}_sum")
                for m in measure_cols
            ],
        )
        return folded.where(F.col("cnt") > 0)

    # USING-style join: Spark emits ONE coalesced column per key name, and
    # the non-key columns (cnt vs cnt_delta, <m>_sum vs <m>_delta) are
    # disjoint, so no alias gymnastics are needed
    joined = state.join(deltas, group_cols, "full_outer")
    out = joined.select(
        *group_cols,
        (
            F.coalesce(F.col("cnt"), zero)
            + F.coalesce(F.col("cnt_delta"), zero)
        ).alias("cnt"),
        *[
            (
                F.coalesce(F.col(f"{m}_sum"), F.lit(0).cast(decimal))
                + F.coalesce(F.col(f"{m}_delta"), F.lit(0).cast(decimal))
            )
            .cast(decimal)
            .alias(f"{m}_sum")
            for m in measure_cols
        ],
    )
    return out.where(F.col("cnt") > 0)


def dirty_groups(
    changelog: DataFrame,
    group_cols: Sequence[str],
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
) -> DataFrame:
    """Distinct group keys touched by a batch (either image) — the set a
    non-retractable aggregate must re-read from the base table."""
    group_cols = list(group_cols)
    lop = F.lower(F.col(op_col))
    a = changelog.where(lop.isin(*(INSERT_CODES + UPDATE_CODES))).select(
        *[F.col(f"{after_col}.{g}").alias(g) for g in group_cols]
    )
    b = changelog.where(lop.isin(*(UPDATE_CODES + DELETE_CODES))).select(
        *[F.col(f"{before_col}.{g}").alias(g) for g in group_cols]
    )
    return a.unionByName(b).distinct()


def refresh_groups(
    state: DataFrame,
    base: DataFrame,
    dirty: DataFrame,
    group_cols: Sequence[str],
    agg_exprs: dict[str, F.Column],
) -> DataFrame:
    """Partial recompute for non-retractable aggregates (MIN/MAX/distinct):
    re-aggregate ``base`` for the dirty groups only (broadcast semi join —
    the dirty set is batch-sized) and replace those state rows wholesale.
    Groups no longer present in the base drop out."""
    group_cols = list(group_cols)
    dirty = dirty.select(*group_cols)
    fresh = (
        base.join(F.broadcast(dirty), group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(*[c.alias(n) for n, c in agg_exprs.items()])
    )
    kept = state.join(F.broadcast(dirty), group_cols, "left_anti")
    return kept.unionByName(fresh)


def state_version_path(state_path: str, batch_id: int) -> str:
    return f"{state_path.rstrip('/')}/v={batch_id}"


def load_state(
    spark, state_path: str, before_batch: int
) -> tuple[DataFrame | None, int | None]:
    """Latest persisted state snapshot with version < before_batch.

    Replays re-derive their own version from the same predecessor, making
    the foreachBatch sink idempotent without a transactional format.
    """
    import re

    try:
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_path)
        fs = jvm_path.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs.exists(jvm_path):
            return None, None
        versions = []
        for st in fs.listStatus(jvm_path):
            m = re.fullmatch(r"v=(\d+)", st.getPath().getName())
            if m and int(m.group(1)) < before_batch:
                versions.append(int(m.group(1)))
    except Exception:
        return None, None
    if not versions:
        return None, None
    v = max(versions)
    return spark.read.parquet(state_version_path(state_path, v)), v


def ivm_foreach_batch(
    state_path: str,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
):
    """foreachBatch sink maintaining the aggregate state across micro-batches:
    ``v=N`` is computed from the latest ``v<N`` snapshot plus batch N's
    deltas, so re-delivery of batch N rewrites the same snapshot."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state, _ = load_state(spark, state_path, batch_id)
        deltas = aggregate_deltas(
            batch_df, group_cols, measure_cols, op_col, before_col, after_col
        )
        merged = merge_state(state, deltas, group_cols, measure_cols)
        merged.write.mode("overwrite").parquet(
            state_version_path(state_path, batch_id)
        )

    return _sink
