"""Scalable exact global ranking: row_number/NTILE over a total order
WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels every row through one
task — the classic global-sort bottleneck. The distributed-exact
alternative is the partition-offset technique:

1. ``repartitionByRange`` on the order columns (parallel range partition —
   Spark samples boundaries, but with a TOTAL order the final ranks are
   boundary-independent);
2. ``sortWithinPartitions`` + per-partition ``row_number`` (partition-local
   window, no funnel);
3. per-partition row counts -> cumulative offsets (one tiny driver-side
   pass over ``num_partitions`` longs, broadcast back as a map literal);
4. global rank = local row_number + partition offset.

NTILE derives from the rank arithmetically with SQL's exact tile-split
semantics (first ``N mod q`` tiles get the extra row), so the result is
bit-identical to ``F.ntile`` / ANSI NTILE — asserted in tests — while the
plan stays parallel end to end. Requires the order to be TOTAL (add a
unique tiebreaker column); ties across partition boundaries would
otherwise make ranks nondeterministic, exactly as they do for plain
``row_number``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_sort_cols(order_by) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def _ranked_with_total(
    df: DataFrame, order_by, rank_col: str
) -> tuple[DataFrame, int]:
    cols = _as_sort_cols(order_by)
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # persisted so the offsets job and the caller's job share one range
    # partitioning; deliberately NOT unpersisted (the returned plan still
    # reads it) — storage is LRU-evictable and recompute is deterministic
    # because the order is total
    ranged = ranged.persist()
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    local = Window.partitionBy("__pid").orderBy(*cols)
    out = ranged.withColumn(
        rank_col,
        (F.row_number().over(local).cast("bigint") + omap[F.col("__pid")]),
    ).drop("__pid")
    return out, total


def with_global_rank(df: DataFrame, order_by, rank_col: str = "rank") -> DataFrame:
    """Exact 1-based global row_number over ``order_by`` (must be a total
    order), computed with the partition-offset plan above."""
    out, _ = _ranked_with_total(df, order_by, rank_col)
    return out


def with_global_cumsum(
    df: DataFrame,
    order_by,
    value_col,
    out_col="cumsum",
) -> DataFrame:
    """Exact running total(s) of ``value_col`` over a global total order,
    without a single-partition window — the same partition-offset plan as
    :func:`with_global_rank`, with per-partition VALUE sums as the
    offsets. ``value_col`` must be exact-typed (decimal/integral): the
    offsets are collected to the driver and re-injected as literals, which
    is only sound when partition-sum + offset-add are exact arithmetic
    (double offsets would make the result partitioning-dependent).

    ``value_col``/``out_col`` may be lists to compute several running
    totals in ONE range partitioning + ONE offsets job (e.g. the two
    cumulative class counts of a KS statistic)."""
    from decimal import Decimal

    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col must pair up")
    dtypes = dict(df.dtypes)
    for vc in value_cols:
        if dtypes[vc].startswith(("double", "float")):
            raise ValueError(
                "with_global_cumsum needs an exact value type "
                f"(decimal/int), got {dtypes[vc]} for {vc}: cast first"
            )
    cols = _as_sort_cols(order_by)
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    sums = {
        r["__pid"]: [r[f"s{i}"] for i in range(len(value_cols))]
        for r in ranged.groupBy("__pid")
        .agg(*[F.sum(vc).alias(f"s{i}") for i, vc in enumerate(value_cols)])
        .collect()
    }
    local = Window.partitionBy("__pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = ranged
    for i, (vc, oc) in enumerate(zip(value_cols, out_cols)):
        offsets, acc = {}, Decimal(0)
        for pid in sorted(sums):
            offsets[pid] = acc
            s = sums[pid][i]
            acc += Decimal(str(s if s is not None else 0))
        wide = (
            "decimal(38,6)" if dtypes[vc].startswith("decimal") else "bigint"
        )
        omap = F.create_map(
            *[
                x
                for pid, off in offsets.items()
                for x in (F.lit(pid), F.lit(str(off)).cast(wide))
            ]
        ) if offsets else F.create_map()
        out = out.withColumn(
            oc,
            (F.sum(vc).over(local).cast(wide) + omap[F.col("__pid")]).cast(
                wide
            ),
        )
    return out.drop("__pid")


def scalable_ntile(
    df: DataFrame, n: int, order_by, out_col: str = "ntile"
) -> DataFrame:
    """Exact ANSI NTILE(n) over a total order, no single-partition stage.

    Tile split matches the standard exactly: with N rows, the first
    ``N mod n`` tiles hold ``N div n + 1`` rows, the rest ``N div n``."""
    if n < 1:
        raise ValueError("n must be >= 1")
    ranked, total = _ranked_with_total(df, order_by, "__rank")
    small, extra = divmod(total, n)
    threshold = extra * (small + 1)
    r = F.col("__rank")
    if small == 0:
        tile = r  # fewer rows than tiles: row i sits alone in tile i
    else:
        tile = F.when(
            r <= threshold, ((r - 1) / (small + 1)).cast("bigint") + 1
        ).otherwise(
            F.lit(extra) + ((r - 1 - threshold) / small).cast("bigint") + 1
        )
    return ranked.withColumn(out_col, tile.cast("bigint")).drop("__rank")
