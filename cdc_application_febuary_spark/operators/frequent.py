"""Exact distributed heavy hitters: candidate generation + confirm pass.

The naive plan — groupBy(key).count() then filter — shuffles EVERY distinct
key. At 100 TB with billions of keys that is the whole dataset through the
wire to find the dozen hot ones. The two-pass shape bounds it:

1. **Candidate pass** (`heavy_hitter_candidates`): each Arrow batch emits
   the values exceeding the batch-local frequency bar ``1/k`` (a
   vectorized ``value_counts`` — C speed, no per-row Python). Pigeonhole
   guarantees the union is a SUPERSET of the true heavy hitters: if
   ``count(v) > N/k`` globally, then ``count_i(v) > n_i/k`` in at least
   one batch (otherwise summing the per-batch bound contradicts the global
   one). Per batch at most ``k-1`` values can clear the bar, so the
   candidate set is at most ``(k-1) * num_batches`` — kilobytes, not the
   key space. This is the same superset-then-verify structure as
   Misra-Gries/SpaceSaving merges, with exact per-batch counts standing in
   for the decrement summary (Arrow already materialized the batch, so the
   exact count is cheaper than simulating streaming).
2. **Confirm pass** (`heavy_hitters`): broadcast the candidate set, filter
   the input map-side (rows for non-candidates never shuffle), take EXACT
   counts of the survivors, keep ``count * k > N``. No approximation in
   the output — it equals ``GROUP BY ... HAVING count > N/k`` exactly,
   which is what makes the operator oracle-pairable while the naive plan's
   shuffle is gone.

Two scans of the input (candidates + confirm); the total-row count rides
the confirm scan's job as a separate agg on the same cached source when the
caller provides it, else a count() scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def heavy_hitter_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct candidate values: every value whose frequency within some
    Arrow batch exceeds ``batch_len / k``. Superset of the global
    ``> N/k`` heavy hitters (see module docstring); at most ``k-1``
    survivors per batch."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    if k < 2:
        raise ValueError("k must be >= 2")
    schema = df.select(F.col(col).alias("value")).schema

    def batch_candidates(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf["value"].value_counts(dropna=True)
            hot = vc[vc > len(pdf) / k]
            if len(hot):
                yield hot.index.to_frame(index=False, name="value")

    return (
        df.select(F.col(col).alias("value"))
        .mapInPandas(batch_candidates, schema=schema)
        .distinct()
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """(value, cnt, frac) for every value with ``count(value) * k > N`` —
    exact, ordered hottest-first. NULLs are never heavy hitters (they are
    a data-quality signal, not a key)."""
    src = df.select(F.col(col).alias("value")).where(F.col("value").isNotNull())
    cand = heavy_hitter_candidates(src, "value", k)
    total = src.agg(F.count(F.lit(1)).alias("__n"))
    counts = (
        src.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("__n"))
        .select(
            "value",
            "cnt",
            F.round(F.col("cnt") / F.col("__n"), 6).alias("frac"),
        )
        .orderBy(F.desc("cnt"), "value")
    )
