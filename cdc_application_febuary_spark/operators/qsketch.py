"""Mergeable quantile sketches: sketch once per shard, merge forever —
the quantile sibling of the HLL module (`operators/sketches.py`).

Per shard (partition / day / source), the value column compresses to K
equal-count centroids (mean, weight) computed from the shard's sorted
values — a t-digest-style summary with deterministic construction (no
randomized compaction), so tests and replays are exactly reproducible.
Any rollup then estimates quantiles from the UNION of centroid rows:
shards x K tiny rows, sorted by centroid mean with cumulative weights.

Error bound: a query quantile can be off by at most the mass of one
centroid per shard crossed, i.e. <= n_shard/K per shard — the classic
equal-weight-summary bound. K=200 keeps worst-case rank error at 0.5% of
each shard regardless of data size.

Scale shape: the raw values sort ONCE, inside their own shard
(`applyInPandas`, numpy sort at C speed); merging and querying touch only
centroid rows (KBs). The final cumulative pass runs on shards x K rows —
scalar-scale data, explicitly NOT the partition-offset machinery, because
the input to it is already thousands of rows at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _sketch_schema(shard_type: DataType) -> StructType:
    """Output schema parameterized by the shard column's own type — a
    'source' string shard is as valid as a numeric one."""
    return StructType(
        [
            StructField("shard", shard_type, True),
            StructField("n", LongType(), False),
            StructField(
                "centroids",
                ArrayType(
                    StructType(
                        [
                            StructField("c", DoubleType(), False),
                            StructField("w", LongType(), False),
                        ]
                    )
                ),
                False,
            ),
        ]
    )


def shard_quantile_sketches(
    df: DataFrame,
    value_col: str,
    shard_col: str,
    k: int = 200,
) -> DataFrame:
    """(shard, n, centroids) — one K-centroid summary per shard. The
    stored artifact: persist next to the shard's data and every later
    quantile rollup reads KBs.

    r11 (guide §4.2): the per-shard grouping runs as a JVM
    ``sort_array(collect_list(v))`` aggregate and ONE mapInPandas pass
    summarizes many shards per Arrow batch — the previous per-group
    ``applyInPandas`` paid a Python call plus a 1-row nested-struct
    Arrow frame PER SHARD (measured 4.7 s vs 0.5 s on 1500 shards x 67
    rows). Centroid arithmetic is unchanged numpy (same np.array_split
    chunking, same np.mean per chunk over the same sorted float64
    array), so every sketch is bit-identical; the per-shard value list
    is materialized whole either way (the equal-weight-summary memory
    bound is unchanged)."""
    import numpy as np
    import pandas as pd

    src = df.select(
        F.col(shard_col).alias("shard"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    grouped = src.groupBy("shard").agg(
        F.sort_array(F.collect_list("v")).alias("__vals")
    )

    def summarize(batches):
        for pdf in batches:
            ns, cents = [], []
            for vals_list in pdf["__vals"]:
                # np.sort kept on top of the JVM sort: guarantees the
                # array np.array_split sees is ordered EXACTLY as the old
                # per-group form sorted it (NaN-last either way; O(n) on
                # sorted input)
                vals = np.sort(np.asarray(vals_list, dtype="float64"))
                n = len(vals)
                chunks = np.array_split(vals, min(k, n))
                ns.append(n)
                cents.append(
                    [
                        {"c": float(ch.mean()), "w": int(len(ch))}
                        for ch in chunks
                        if len(ch)
                    ]
                )
            yield pd.DataFrame(
                {"shard": pdf["shard"], "n": ns, "centroids": cents}
            )

    return grouped.mapInPandas(
        summarize, _sketch_schema(df.schema[shard_col].dataType)
    )


def merge_quantiles(
    sketches: DataFrame, probs: list[float]
) -> DataFrame:
    """(p, estimate) — quantile estimates from the union of centroid rows.
    Input is shards x K tiny rows; the cumulative window here runs on
    scalar-scale data by construction (see module docstring)."""
    cent = sketches.select(
        F.explode("centroids").alias("ct")
    ).select(F.col("ct.c").alias("c"), F.col("ct.w").alias("w"))
    w = Window.orderBy("c", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cent.withColumn("cum", F.sum("w").over(w)).withColumn(
        "total", F.sum("w").over(Window.partitionBy())
    )
    # ONE pass for every requested quantile: the pick for p is the
    # smallest centroid mean whose cumulative weight crosses ceil(p*n),
    # i.e. min(c) over qualifying rows — value-identical to the previous
    # per-p orderBy+limit(1) subplans, which each re-ran the global
    # cumulative window (r10 optimization, guide §1.2: the window sort
    # executed once per probe point).
    row = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(p) * F.col("total")),
                    F.col("c"),
                )
            ).alias(f"_e{i}")
            for i, p in enumerate(probs)
        ]
    )
    picks = (
        row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(p)).alias("p"),
                            F.col(f"_e{i}").alias("estimate"),
                        )
                        for i, p in enumerate(probs)
                    ]
                )
            ).alias("r")
        )
        .select("r.*")
        # empty centroid set: the old per-p form returned zero rows
        .where(F.col("estimate").isNotNull())
    )
    return picks.orderBy("p")
