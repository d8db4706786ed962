"""Benchmark contamination detection: flag training documents that overlap
an evaluation set by shared word n-grams.

Standard pretraining hygiene (GPT-3 §C, PaLM §7, Llama papers): before
training, every document is checked for n-gram collisions against the
benchmarks the model will be evaluated on, and contaminated documents are
dropped or decontaminated. The shape that survives 100 TB:

- The *benchmark* side is small (eval suites are MBs) — its n-gram set is
  broadcast, so the corpus is never shuffled for the join: each corpus
  partition filters its exploded n-grams map-side (broadcast hash join),
  and only the surviving (doc, benchmark-ngram) hits — a tiny fraction —
  flow into the per-(doc, bench) count aggregation.
- N-grams stay distinct-per-document (``word_shingles`` dedups), so a
  document repeating one benchmark phrase 1000x scores once — overlap is
  measured in unique n-grams, the published convention.
- The score is ``overlap / benchmark_ngrams``: the fraction of the
  benchmark item visible in the document, which is the decision-relevant
  direction (a 10k-token doc quoting an entire 40-token benchmark answer
  is contamination; 3 generic 5-grams are not).

At larger-than-broadcast benchmark sizes, ``join_mode="hash"`` swaps the
broadcast for an equi-join on ``xxhash64(ngram)``: both sides project the
n-gram to a 64-bit key before the join, so the shuffle moves 8-byte longs
instead of repeated n-gram strings and no single executor must hold the
benchmark set. (64-bit collisions add ~n_bench_ngrams/2^64 false-hit
probability per corpus n-gram — negligible against the 0.5 overlap
threshold.) The driver query keeps the literal-string broadcast mode so
the DuckDB oracle can replay it verbatim; both modes are asserted equal
in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    join_mode: str = "broadcast",
) -> DataFrame:
    """(doc_id, bench_id, overlap_ngrams, bench_ngrams, overlap_frac) for
    every document/benchmark pair sharing at least one word n-gram.

    ``join_mode``: "broadcast" (benchmark n-grams broadcast, corpus never
    shuffled — the MB-scale eval-suite case) or "hash" (shuffle equi-join
    on xxhash64(ngram) — the beyond-broadcast case; see module docstring).
    """
    if join_mode not in ("broadcast", "hash"):
        raise ValueError(f"unknown join_mode {join_mode!r}")
    d = docs.select(
        F.col(id_col).alias("doc_id"), T.tokens(text_col).alias("__w")
    ).select(
        "doc_id", F.explode(T.shingles_from_tokens(F.col("__w"), n)).alias("g")
    )
    b = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        T.tokens(bench_text_col).alias("__w"),
    ).select(
        "bench_id",
        F.explode(T.shingles_from_tokens(F.col("__w"), n)).alias("g"),
    )
    bench_sizes = b.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    if join_mode == "hash":
        dh = d.select("doc_id", F.xxhash64("g").alias("gh"))
        bh = b.select("bench_id", F.xxhash64("g").alias("gh"))
        joined = dh.join(bh, "gh")
    else:
        joined = d.join(F.broadcast(b), "g")
    hits = joined.groupBy("doc_id", "bench_id").agg(
        F.count(F.lit(1)).alias("overlap_ngrams")
    )
    return hits.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "overlap_ngrams",
        "bench_ngrams",
        F.round(
            F.col("overlap_ngrams") / F.col("bench_ngrams"), 6
        ).alias("overlap_frac"),
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_overlap_frac: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Per-document contamination verdict: the worst benchmark collision and
    how many benchmark items the document touches at all. Documents with
    ``max_overlap_frac >= min_overlap_frac`` are the drop set."""
    ov = ngram_overlap(docs, benchmark, n=n, **kwargs)
    return (
        ov.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("overlap_frac").alias("max_overlap_frac"),
        )
        .where(F.col("max_overlap_frac") >= F.lit(min_overlap_frac))
    )
