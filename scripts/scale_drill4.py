#!/usr/bin/env python
"""Decade datapoints for the late-round-5 operators: DSIR importance
weights (vocabulary-bounded model + word-keyed join) and SemDeDup
(k-means + per-cluster pairwise pruning) at 1x and 10x the sf0.1 corpus.

Documents replicate with a per-replica tail token (vocabulary grows by
REPLICAS words; the model join stays vocabulary-bounded). Embeddings
replicate with a first-component nudge — each original gains ~9 very
close near-duplicates, the adversarially heavy case for SemDeDup (dup
groups of ~10 inside every cluster).

SemDeDup is measured twice at 10x: with k FIXED (the dishonest config —
per-cluster pairwise work grows ~100x) and with k scaled 10x (the
documented dial — E|cluster| constant, work ~linear). The drill exists
to show the difference, not to hide it.

Usage: python scripts/scale_drill4.py   (time it alone; contention skews)
Prints a markdown table (min-of-2 warm) for SCALE.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill4"
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
    from cdc_application_febuary_spark.operators.dedup import semantic_dedup
    from cdc_application_febuary_spark.operators.dsir import dsir_log_weights
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill4")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents").select(
        "doc_id", "text", "lang"
    )
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
            "lang",
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
    print(f"docs {docs1.count()} -> {docs10.count()}; embeddings x{REPLICAS}")

    def run(df):
        # full materialization via noop sink (count() lets Catalyst prune
        # the work under test — same harness rule as bench.py)
        df.write.mode("overwrite").format("noop").save()

    def dsir_job(docs):
        return dsir_log_weights(docs, docs.where(F.col("lang") == "en"))

    jobs = {
        "dsir_log_weights": (
            lambda: run(dsir_job(docs1)),
            lambda: run(dsir_job(docs10)),
        ),
        "semantic_dedup (k FIXED=8)": (
            lambda: run(semantic_dedup(emb1, n_clusters=8, threshold=0.45)),
            lambda: run(semantic_dedup(emb10, n_clusters=8, threshold=0.45)),
        ),
        "semantic_dedup (k scaled 8->80)": (
            lambda: run(semantic_dedup(emb1, n_clusters=8, threshold=0.45)),
            lambda: run(
                semantic_dedup(emb10, n_clusters=80, threshold=0.45)
            ),
        ),
    }
    env = {
        "dsir_log_weights": "linear (vocab-bounded model; word-keyed join)",
        "semantic_dedup (k FIXED=8)": (
            "superlinear BY DESIGN (per-cluster pairwise ~(10n/k)^2)"
        ),
        "semantic_dedup (k scaled 8->80)": (
            "~linear (E|cluster| held constant — the documented dial)"
        ),
    }
    print("\n| operator | 1x s | 10x s | ratio | envelope |")
    print("|---|---|---|---|---|")
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
