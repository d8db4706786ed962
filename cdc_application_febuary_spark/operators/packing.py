"""Sequence packing: assign documents to fixed token-budget bins for
training-batch construction.

A 100 TB pretraining pipeline packs tokenized documents into fixed-length
sequences (budget = model context length) so no batch slot is wasted.
Optimal bin packing is NP-hard and inherently sequential, so the scalable
formulation is *deterministic next-fit within independent shards*:

- shard by a grouping column (source, date bucket, ...) — shards pack in
  parallel with zero coordination, and re-running any shard is idempotent;
- within a shard, walk documents in id order keeping one open bin: if the
  next document would overflow the budget, seal the bin and open a new one.

Next-fit is within 2x of optimal fill in the worst case and in practice
within a few percent for heavy-tailed document lengths, while needing O(1)
state per shard — the property that makes it streamable. The walk itself is
a tight numpy/python loop over one shard inside ``applyInPandas`` (Arrow
batches in, Arrow batches out); memory is bounded by the largest shard, so
shard granularity is the scale dial.

An oversized document (tokens > budget) opens its own bin and, by the
next-fit rule, every following document overflows it immediately — so
oversized docs occupy dedicated bins and never block later packing.

Reference scope note: the reference engine has no packing operator — this
is part of the beyond-reference LLM-data-pipeline surface (brief §
"training-data pipeline"), built on the same token counts as
``functions/text.py:token_count``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def pack_documents(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """(id, shard, n_tokens, bin_id) — deterministic next-fit packing.

    ``bin_id`` is 0-based per shard; global bin identity is the pair
    (shard, bin_id), so no cross-shard coordination (or global sequence)
    is ever needed.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    counted = docs.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        T.token_count(text_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        for tok in pdf["n_tokens"]:
            if fill > 0 and fill + tok > budget:
                bin_id += 1
                fill = 0
            fill += tok
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return counted.groupBy("shard").applyInPandas(
        pack, schema="id long, shard string, n_tokens long, bin_id long"
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing quality: bins used, docs, token fill, utilization
    (fraction of bin capacity actually filled — the number a batch-builder
    cares about). One aggregation, no second pass over the documents."""
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin_id") + 1).alias("n_bins"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("total_tokens")
                / (F.col("n_bins") * F.lit(float(budget))),
                6,
            ),
        )
    )
