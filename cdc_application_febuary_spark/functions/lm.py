"""Character n-gram language-model scoring — perplexity-style corpus
filtering without an external model.

Production corpus pipelines (CCNet and its descendants) filter documents
by language-model perplexity: text that a model of the corpus finds very
surprising is usually boilerplate, encoding garbage, or spam. This is
the self-contained Spark form: train a character-trigram model ON the
corpus (one groupBy over exploded trigrams), score each document by its
average add-one-smoothed trigram log-probability, and filter on the
score distribution. Everything is column expressions — the trigram
explode is `transform(sequence(...), i -> substr(text, i, 3))`, so no
Python touches the hot path — and the per-document aggregation sums
DECIMAL-rounded logs, so the score is exact and order-independent
(engine-portable; the DuckDB oracle replays it bit-for-bit).

Scale: the model is a (trigram, count) table bounded by the alphabet
cubed in distinct keys — it shuffles once to count and once to join
back (broadcast when small). Documents never move except by their
trigram keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_windows(col, n: int = 3):
    """Array of all length-``n`` character windows of a string column.

    The input must already be normalized: embedding ``lower(trim(x))``
    inside the transform lambda re-evaluates it once per ELEMENT —
    O(len^2) per document (measured 6.7s -> 0.4s on the sf0.1 explode
    when hoisted). Use `char_ngrams` when you have a raw column."""
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(col, n: int = 3):
    """`char_windows` over ``lower(trim(col))`` — convenience form for
    ad-hoc use; hot paths should pre-project the normalized string and
    call `char_windows` (see that docstring)."""
    return char_windows(F.lower(F.trim(col)), n)


def trigram_model(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(trigram, cnt) counts over the corpus — the 'model'."""
    return (
        docs.select(F.lower(F.trim(F.col(text_col))).alias("__t"))
        .select(F.explode(char_windows(F.col("__t"))).alias("tri"))
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_trigrams, lm_score) — lm_score is the mean add-one
    trigram log-probability (higher = more typical of the corpus; the
    negative of a per-character log-perplexity). ``model`` defaults to
    training on ``docs`` itself. Unseen trigrams (cross-corpus scoring)
    take the +1 smoothing mass. Docs under 3 chars score NULL.

    Exactness: each trigram contributes ``round(ln((cnt+1)/(T+D)), 6)``
    as DECIMAL(18,6); the per-doc SUM is exact, so the only float step
    is the final mean, rounded once."""
    exploded = None
    if model is None:
        # self-scoring: explode ONCE, persist the (doc, trigram) table,
        # derive the model from it — halves the scan+explode work
        exploded = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.lower(F.trim(F.col(text_col))).alias("__t"),
            )
            .select(
                "doc_id", F.explode(char_windows(F.col("__t"))).alias("tri")
            )
            .persist()
        )
        model = exploded.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt"))
    totals = model.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("d")
    )
    if exploded is not None:
        tri_tbl = exploded
    else:
        tri_tbl = docs.select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.trim(F.col(text_col))).alias("__t"),
        ).select(
            "doc_id", F.explode(char_windows(F.col("__t"))).alias("tri")
        )
    # r11 (guide §1.2): lp depends ONLY on model-side (cnt, t, d) — compute
    # it once per DISTINCT trigram (alphabet^3-bounded rows) and let the
    # broadcast join carry the ready decimal, instead of evaluating
    # log+round+decimal-cast once per exploded corpus OCCURRENCE
    # (corpus-character-sized rows). Bit-identical: the same double
    # expression over the same (cnt, t, d) yields the same value no
    # matter which row computes it; unseen trigrams (lp NULL after the
    # left join) take the coalesce fallback, which is the old expression
    # with cnt = 0 exactly ((0 + 1.0) == 1.0) and short-circuits to zero
    # evaluations in the self-scoring case.
    model_lp = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "tri",
            F.round(
                F.log((F.col("cnt") + F.lit(1.0)) / (F.col("t") + F.col("d"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    scored_tri = (
        # broadcast: the model is alphabet^3-bounded (distinct trigrams),
        # while tri_tbl is corpus-character-sized — a shuffle join here
        # moves the whole exploded corpus by trigram key
        tri_tbl.join(F.broadcast(model_lp), "tri", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.coalesce(
                F.col("lp"),
                F.round(
                    F.log(F.lit(1.0) / (F.col("t") + F.col("d"))), 6
                ).cast("decimal(18,6)"),
            ).alias("lp"),
        )
    )
    per_doc = scored_tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(
            F.sum("lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("lm_score"),
    )
    if exploded is not None:
        # per-doc scores are one small row per document — materialize them
        # (localCheckpoint) so the corpus-sized exploded cache can be
        # released now instead of leaking for the DataFrame's lifetime
        per_doc = per_doc.localCheckpoint(eager=True)
        exploded.unpersist()
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        "lm_score",
    )


def lm_scores_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_trigrams, sum_lp_e6) — the exact-integer form of
    :func:`lm_scores` for rank/bucket consumers: instead of the rounded
    mean, expose the per-doc SUM of DECIMAL(18,6) trigram log-probs as a
    scale-6 BIGINT. Downstream ordering keys use the single correctly-
    rounded division ``CAST(sum_lp_e6 AS DOUBLE) / n_trigrams`` (bit-
    identical across engines), so rank-based thresholds (CCNet
    head/middle/tail) are engine-portable without ever hashing a rounded
    quotient. Docs with fewer than 3 chars are absent (no trigrams)."""
    exploded = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.trim(F.col(text_col))).alias("__t"),
        )
        .select("doc_id", F.explode(char_windows(F.col("__t"))).alias("tri"))
        .persist()
    )
    model = exploded.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt"))
    totals = model.agg(F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("d"))
    # lp per DISTINCT trigram, not per occurrence (r11 — see lm_scores);
    # inner self-join: every trigram is in the model, no unseen fallback
    model_lp = model.crossJoin(F.broadcast(totals)).select(
        "tri",
        F.round(
            F.log((F.col("cnt") + F.lit(1.0)) / (F.col("t") + F.col("d"))),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    scored = (
        # broadcast for the same reason as lm_scores: never shuffle the
        # corpus-sized exploded table by trigram
        exploded.join(F.broadcast(model_lp), "tri").select("doc_id", "lp")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        (F.sum("lp") * 1_000_000).cast("long").alias("sum_lp_e6"),
    )
    per_doc = per_doc.localCheckpoint(eager=True)
    exploded.unpersist()
    return per_doc
