#!/usr/bin/env python
"""Decade datapoints for the round-5 operators: character-entropy filter
(map-only plan), substring-level dedup (window-fingerprint equi-join), and
hybrid retrieval fusion (BM25 + blocked cosine) at 1x and 10x the sf0.1
corpus. Documents get a per-replica tail suffix (so the corpus is
near-duplicated — the adversarially heavy case for substring dedup: almost
every window is duplicated 10x); embeddings get a first-component nudge.

Usage: python scripts/scale_drill3.py
Prints a markdown table (min-of-2 warm) for SCALE.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill3"
REPLICAS = 10


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.operators.dedup import (
        duplicated_span_stats,
    )
    from cdc_application_febuary_spark.operators.similarity import (
        cosine_topk_blocked,
    )
    from cdc_application_febuary_spark.operators.vectorize import bm25_scores
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill3")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents").select("doc_id", "text")
    emb1 = load_table(spark, SRC, "embeddings")
    max_doc = docs1.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb1.agg(F.max("vec_id")).first()[0] + 1

    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    docs10 = (
        docs1.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__r") * max_doc).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" tail"), F.col("__r").cast("string")
            ).alias("text"),
        )
    )
    emb10 = (
        emb1.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__r") * max_vec).alias("vec_id"),
            F.concat(
                F.array(
                    F.element_at("embedding", 1)
                    + F.col("__r").cast("float") / 100.0
                ),
                F.slice("embedding", 2, 63),
            ).alias("embedding"),
        )
    )
    for name, df in (("docs10", docs10), ("emb10", emb10)):
        df.write.mode("overwrite").parquet(f"{WORK}/{name}.parquet")
    docs10 = spark.read.parquet(f"{WORK}/docs10.parquet")
    emb10 = spark.read.parquet(f"{WORK}/emb10.parquet")
    n1, n10 = docs1.count(), docs10.count()
    print(f"docs {n1} -> {n10}; embeddings x{REPLICAS}")

    import string as _string

    def entropy_job(docs):
        lt = F.regexp_replace(F.lower("text"), "[^a-z]", "")
        base = docs.select("doc_id", lt.alias("lt")).select(
            "doc_id", "lt", F.length("lt").alias("n")
        )
        n = F.col("n")

        def term(letter):
            c = n - F.length(F.translate(F.col("lt"), letter, ""))
            p = c.cast("double") / n
            return F.when(
                c > 0, F.round(-p * F.log(p), 6).cast("decimal(18,6)")
            ).otherwise(F.lit(0).cast("decimal(18,6)"))

        ent = sum(
            (term(l) for l in _string.ascii_lowercase),
            F.lit(0).cast("decimal(18,6)"),
        )
        return (
            base.where(n >= 50)
            .select("doc_id", ent.cast("double").alias("e"))
            .orderBy(F.col("e").asc(), "doc_id")
            .limit(20)
        )

    def rrf_job(docs, emb):
        bm = (
            bm25_scores(docs, ["spark", "merge", "vector"])
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(30)
        )
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cos = cosine_topk_blocked(emb, q, k=30, query_id_col="query_id")
        return bm.join(
            cos.select(F.col("neighbor_id").alias("doc_id")), "doc_id",
            "full_outer",
        )

    def run(df):
        # force full materialization of every column — a bare count() lets
        # Catalyst eliminate joins/projections (the substring stats join
        # collapsed to counting base rows on the first attempt)
        df.write.mode("overwrite").format("noop").save()

    jobs = {
        "doc_entropy (map-only)": (
            lambda: run(entropy_job(docs1)),
            lambda: run(entropy_job(docs10)),
        ),
        "substring_dup (hashed, W=8)": (
            lambda: run(duplicated_span_stats(docs1, width=8)),
            lambda: run(duplicated_span_stats(docs10, width=8)),
        ),
        "hybrid RRF (BM25+cosine)": (
            lambda: run(rrf_job(docs1, emb1)),
            lambda: run(rrf_job(docs10, emb10)),
        ),
    }
    print("\n| operator | 1x s | 10x s | ratio | envelope |")
    print("|---|---|---|---|---|")
    env = {
        "doc_entropy (map-only)": "linear (one scan, 0 exchanges)",
        "substring_dup (hashed, W=8)": "~linear rows (hash agg per window)",
        "hybrid RRF (BM25+cosine)": "linear (tokenize + matmul scale with corpus)",
    }
    for name, (j1, j10) in jobs.items():
        t1 = timed(j1)
        t10 = timed(j10)
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x |"
            f" {env[name]} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
