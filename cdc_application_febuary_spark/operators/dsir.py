"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much more likely its
bag of words is under a TARGET distribution than under the RAW corpus
distribution, then keep the top-weighted documents. The published method
hashes n-grams into buckets; this form keeps the exact word-unigram
model so the weights are fully SQL-expressible and the driver oracle can
replay them bit-for-bit (the hashed variant changes only the feature key,
not the plan shape).

Spark-first shape: one explode over the corpus builds the (doc, word)
table; two word-keyed groupBys build the raw and target unigram models
(both map-side combinable, bounded by vocabulary size, NOT corpus size);
the per-word log-ratio joins back to the token table by word and one
keyed sum produces each document's log importance weight. No driver
collect anywhere; every join is an equi-join.

Cross-engine exactness: each word's log-ratio is the difference of two
``round(ln(p), 6)`` terms carried as DECIMAL(18,6) (the proven
lm/BM25 pattern) — the per-document SUM is exact and order-independent,
so ranking and hashing agree between Spark and the DuckDB oracle with no
float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logw) — logw is the exact-DECIMAL log importance
    weight sum_w count_w(doc) handled per occurrence:
    ``round(ln p_target(w),6) - round(ln p_raw(w),6)``, with add-one
    smoothing over the RAW vocabulary on both models (target is usually a
    subset of docs, so every scored word has a raw count; target counts
    may be zero and take the smoothing mass).

    ``target`` must carry the same ``id_col``/``text_col`` columns; it is
    re-tokenized independently so callers may pass any reference corpus.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    raw_model = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cr"))
    raw_tot = raw_model.agg(
        F.sum("cr").alias("tr"), F.count(F.lit(1)).alias("v")
    )
    tgt_counts = (
        target.select(
            F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tgt_tot = tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    wt = (
        raw_model.join(tgt_counts, "w", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "w",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.col("v"))
                    ),
                    6,
                ).cast("decimal(18,6)")
                - F.round(
                    F.log(
                        (F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.col("v"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("lw"),
        )
    )
    return (
        toks.join(wt, "w")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw").alias("logw"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "logw")
    )


def dsir_select_topk(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The selection step: top-``k`` documents by log importance weight,
    ordered on the EXACT decimal weight (ties break on id) so the cut is
    deterministic across engines and partitionings. TakeOrderedAndProject
    handles the global top-k without a single-partition sort."""
    w = dsir_log_weights(docs, target, id_col=id_col, text_col=text_col)
    return w.orderBy(F.col("logw").desc(), F.col(id_col)).limit(k)


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """The paper's actual selection step — importance RESAMPLING, not a
    hard top-k: draw ``k`` documents without replacement with inclusion
    probability scaling in exp(logw). Implemented as Gumbel top-k on the
    log weight: ``key = logw - ln(-ln u)`` with the same deterministic
    ``u = unit_hash(id, seed)`` every sampler in `operators/sampling.py`
    uses, so the draw is a pure function of (ids, weights, seed) across
    runs and partitionings. Ranking by this key is ORDER-IDENTICAL to
    the Efraimidis-Spirakis ``u^(1/w)`` key at ``w = exp(logw)``
    (both reduce to ascending Exp_i/w_i), but stays in log space — no
    exp() under/overflow at extreme weights. Plan: one key expression +
    distributed top-k (TakeOrderedAndProject); un-sampled rows never
    shuffle."""
    from .sampling import _unit_hash

    if k < 1:
        raise ValueError("k must be >= 1")
    lw = dsir_log_weights(docs, target, id_col=id_col, text_col=text_col)
    key = F.col("logw").cast("double") - F.log(
        -F.log(_unit_hash(id_col, seed))
    )
    return (
        lw.withColumn("__gumbel_key", key)
        .orderBy(F.desc("__gumbel_key"))
        .limit(k)
        .drop("__gumbel_key")
    )
