"""Gopher-style repetition filters (Rae et al. 2021, arXiv:2112.11446,
Table A1) — the standard pre-training quality gate the reference's corpus
tooling lacks a native analog for, re-expressed as pure DataFrame ops.

Per document, over a pre-projected token array:

* **duplicate-line fraction / duplicate-line character fraction** — lines
  whose full text occurs more than once within the document (every
  occurrence of a repeated line counts, the convention used by the
  published reproductions);
* **top n-gram character coverage** (n = 2, 3 by default) — characters
  covered by the heaviest word n-gram, computed as ``max(count * chars)``
  over the document's n-grams. This equals the most-frequent n-gram's
  coverage except when an equally-frequent longer gram covers more — a
  deterministic tie-break both engines share (``arg_max``-style picks are
  tie-nondeterministic across engines and partitionings);
* **duplicate n-gram character coverage** (n = 5, 10 by default) — the
  standard non-overlap-corrected sum ``count * chars`` over n-grams
  occurring more than once (the datatrove/Dolma approximation of Gopher's
  span union; may exceed total_chars on pathological inputs, thresholds
  are calibrated for that).

Everything stays in integer arithmetic (character counts, token counts) so
the Gopher thresholds can be applied by cross-multiplication — no float
division anywhere, which keeps the whole report hash-comparable across
engines (CLAUDE.md: never ROUND a double division).

Scale shape: ONE explode + keyed groupBy for all n-gram sizes together and
one for lines, both keyed by (doc, gram) — map-side combine applies, no
window functions, no driver collection. Reference parity: the reference
has no repetition filter; this extends its quality-scoring surface
(`backend/ingestion/profiling.py`-adjacent) with the published recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Gopher Table A1 thresholds, expressed as (numerator multiplier,
# denominator multiplier): frac > num/den  <=>  den*x > num*total.
THRESHOLDS = {
    "dup_line_frac": (3, 10),        # > 0.30 of lines are repeats
    "dup_line_char_frac": (1, 5),    # > 0.20 of chars in repeated lines
    "top2_char_frac": (1, 5),        # > 0.20 of chars in top 2-gram
    "top3_char_frac": (9, 50),       # > 0.18 of chars in top 3-gram
    "dup5_char_frac": (3, 20),       # > 0.15 of chars in dup 5-grams
    "dup10_char_frac": (1, 10),      # > 0.10 of chars in dup 10-grams
}


def _grams(toks: Column, n: int) -> Column:
    """All word n-grams of a pre-projected token array (with repeats —
    unlike shingles_from_tokens, counts matter here so no distinct)."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def _lines(toks: Column, width: int) -> Column:
    """Deterministic re-lining: consecutive ``width``-token chunks (the
    fixture corpus has no newlines; a fixed chunking gives both engines the
    same 'lines' and makes the metric meaningful on any corpus)."""
    n_chunks = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda c: F.concat_ws(" ", F.slice(toks, c * width + 1, width))
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    line_width: int = 8,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Per-document Gopher repetition counters, all BIGINT.

    Input: ``df[id_col, tokens_col]`` with the token array pre-projected
    (see shingles_from_tokens on why — a lambda-embedded split re-evaluates
    per element). Output columns: total_tokens, total_chars, total_lines,
    dup_lines, dup_line_chars, top{n}_cover per ``top_ns``, dup{n}_cover
    per ``dup_ns``.
    """
    toks = F.col(tokens_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("total_tokens"),
        F.length(F.concat_ws(" ", toks)).cast("long").alias("total_chars"),
        toks.alias("_toks"),
    )
    # one explode for every n-gram size together: (id, n, gram). NB: the
    # tagging lambda must take exactly ONE argument — a two-parameter
    # transform lambda receives (element, INDEX), so `lambda g, n=n:`
    # would silently bind the array index as the tag.
    def _tagged(n: int) -> Column:
        nlit = F.lit(n)
        return F.transform(
            _grams(F.col("_toks"), n),
            lambda g: F.struct(nlit.alias("n"), g.alias("g")),
        )

    # r10: LINES ride the same explode as the grams, tagged n = 0 (no
    # gram size is 0, so the keyspaces cannot collide) — previously the
    # line counters were a second explode + groupBy + join chain over the
    # same token arrays, doubling the tokenization scans, shuffles, and
    # per-doc joins; merged, the counters are value-identical because
    # every (id, n, g) group is untouched, only co-shuffled.
    gram_arrays = F.flatten(
        F.array(
            *[_tagged(n) for n in (*top_ns, *dup_ns)],
            F.transform(
                _lines(F.col("_toks"), line_width),
                lambda g: F.struct(F.lit(0).alias("n"), g.alias("g")),
            ),
        )
    )
    # explode_outer + null guard, NOT plain explode: the optimizer's
    # InferFiltersFromGenerate would otherwise plant a Filter(size>0)
    # below the Generate whose pushdown inlines the whole gram-build
    # expression with the source tokenization re-evaluated per lambda
    # element — O(grams x doc_length) per row (see operators/c4.py for
    # the measured 20x cliff on long documents).
    gram_counts = (
        base.select("id", F.explode_outer(gram_arrays).alias("ng"))
        .where(F.col("ng").isNotNull())
        .groupBy("id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cover = F.col("cnt") * F.length("g").cast("long")
    line_row = F.col("n") == 0
    gram_aggs = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, cover)), F.lit(0).cast("long")
        ).alias(f"top{n}_cover")
        for n in top_ns
    ] + [
        F.coalesce(
            F.sum(F.when((F.col("n") == n) & (F.col("cnt") > 1), cover)),
            F.lit(0).cast("long"),
        ).alias(f"dup{n}_cover")
        for n in dup_ns
    ] + [
        F.coalesce(F.sum(F.when(line_row, F.col("cnt"))), F.lit(0))
        .cast("long")
        .alias("total_lines"),
        F.coalesce(
            F.sum(F.when(line_row & (F.col("cnt") > 1), F.col("cnt"))),
            F.lit(0),
        ).cast("long").alias("dup_lines"),
        F.coalesce(
            F.sum(
                F.when(
                    line_row & (F.col("cnt") > 1),
                    F.col("cnt") * F.length("g").cast("long"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("dup_line_chars"),
    ]
    per_doc_grams = gram_counts.groupBy("id").agg(*gram_aggs)

    out = base.drop("_toks").join(per_doc_grams, "id", "left")
    fill = {"total_lines": 0, "dup_lines": 0, "dup_line_chars": 0}
    for n in top_ns:
        fill[f"top{n}_cover"] = 0
    for n in dup_ns:
        fill[f"dup{n}_cover"] = 0
    return out.fillna(fill)


def repetition_flags(stats: DataFrame) -> DataFrame:
    """Gopher pass/fail flags from the integer counters — each threshold
    applied by cross-multiplication, exact in any engine."""

    def over(x: str, total: str, num: int, den: int) -> Column:
        return F.lit(den) * F.col(x) > F.lit(num) * F.col(total)

    t = THRESHOLDS
    return stats.select(
        "*",
        over("dup_lines", "total_lines", *t["dup_line_frac"]).alias(
            "fail_dup_line"
        ),
        over("dup_line_chars", "total_chars", *t["dup_line_char_frac"]).alias(
            "fail_dup_line_chars"
        ),
        over("top2_cover", "total_chars", *t["top2_char_frac"]).alias(
            "fail_top2"
        ),
        over("top3_cover", "total_chars", *t["top3_char_frac"]).alias(
            "fail_top3"
        ),
        over("dup5_cover", "total_chars", *t["dup5_char_frac"]).alias(
            "fail_dup5"
        ),
        over("dup10_cover", "total_chars", *t["dup10_char_frac"]).alias(
            "fail_dup10"
        ),
    )
