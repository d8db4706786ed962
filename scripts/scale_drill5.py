#!/usr/bin/env python
"""Decade datapoints for the round-6 operators: Gopher repetition filters,
the C4 cleaning stack, and the exact covariance moments, at 1x and 10x the
sf0.1 corpus — along TWO axes, because they stress different things:

* 10x ROWS (replicated docs with a per-replica tail token): per-doc work
  is independent, so the expectation is linear scaling;
* 10x LENGTH (each document's text concatenated 10 times): per-doc gram /
  line groups grow 10x — the adversarial axis for anything that keys by
  (doc, gram), and a repetition-SATURATED input (every line duplicated
  ~10x, every 5/10-gram duplicated) for the counters themselves.

The covariance drill also reports the groupBy cardinality honesty note:
the final aggregate has exactly 64 keys, which would be a 64-reducer
bottleneck WITHOUT partial aggregation — map-side combine reduces each
task to 64 rows before the exchange, so the shuffle volume is
64 x n_tasks regardless of corpus size.

Usage: python scripts/scale_drill5.py   (run alone; min-of-2 warm,
noop-sink materialization). Prints a markdown table for SCALE.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill5"
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
    from cdc_application_febuary_spark.functions.text import tokens
    from cdc_application_febuary_spark.operators.c4 import c4_line_filter
    from cdc_application_febuary_spark.operators.gopher import (
        _lines,
        repetition_flags,
        repetition_stats,
    )
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill5")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents").select("doc_id", "text")
    emb1 = load_table(spark, SRC, "embeddings")
    max_doc = docs1.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb1.agg(F.max("vec_id")).first()[0] + 1

    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    docs10r = docs1.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * max_doc).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" tail"), F.col("__r").cast("string")
        ).alias("text"),
    )
    docs10l = docs1.select(
        "doc_id",
        F.concat_ws(
            " ", F.array_repeat(F.col("text"), REPLICAS)
        ).alias("text"),
    )
    emb10 = emb1.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("__r") * max_vec).alias("vec_id"),
        F.concat(
            F.array(
                F.element_at("embedding", 1)
                + F.col("__r").cast("float") / 100.0
            ),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    for name, df in (
        ("docs10r", docs10r),
        ("docs10l", docs10l),
        ("emb10", emb10),
    ):
        df.write.mode("overwrite").parquet(f"{WORK}/{name}.parquet")
    docs10r = spark.read.parquet(f"{WORK}/docs10r.parquet")
    docs10l = spark.read.parquet(f"{WORK}/docs10l.parquet")
    emb10 = spark.read.parquet(f"{WORK}/emb10.parquet")
    print(
        f"docs {docs1.count()} -> rows x{REPLICAS} = {docs10r.count()}, "
        f"length x{REPLICAS}; embeddings {emb1.count()} -> {emb10.count()}"
    )

    def gopher_job(docs):
        toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        return repetition_flags(repetition_stats(toked))

    def c4_job(docs):
        toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        lined = toked.select(
            "doc_id",
            F.transform(
                _lines(F.col("toks"), 8), lambda l: F.concat(l, F.lit("."))
            ).alias("lines"),
        )
        return c4_line_filter(lined)

    def cov_job(emb):
        from cdc_application_febuary_spark.queries.corpus_ops import (
            embedding_covariance_report,  # noqa: F401 (plan shape)
        )

        q = F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * 4096).cast("long"),
        )
        base = emb.select(q.alias("q"))
        terms = F.transform(
            F.sequence(F.lit(0), F.size("q") - 1),
            lambda i: F.struct(
                i.alias("dim"),
                F.element_at(F.col("q"), i + 1).alias("qi"),
            ),
        )
        return (
            base.select(F.explode(terms).alias("t"))
            .groupBy("t.dim")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("t.qi").alias("sum_q"),
                F.sum(F.col("t.qi") * F.col("t.qi")).alias("sum_q2"),
            )
        )

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    rows = []
    for name, job, one, tenr, tenl in (
        ("gopher_repetition", gopher_job, docs1, docs10r, docs10l),
        ("c4_line_filter", c4_job, docs1, docs10r, docs10l),
        ("covariance_moments", cov_job, emb1, emb10, None),
    ):
        t1 = timed(lambda: run(job(one)))
        t10r = timed(lambda: run(job(tenr)))
        t10l = timed(lambda: run(job(tenl))) if tenl is not None else None
        rows.append((name, t1, t10r, t10l))

    print("\n| operator | 1x s | 10x-rows s | ratio | 10x-len s | ratio |")
    print("|---|---|---|---|---|---|")
    for name, t1, t10r, t10l in rows:
        l10 = f"{t10l:.2f}" if t10l is not None else "—"
        lr = f"{t10l / t1:.1f}x" if t10l is not None else "—"
        print(
            f"| {name} | {t1:.2f} | {t10r:.2f} | {t10r / t1:.1f}x "
            f"| {l10} | {lr} |"
        )


if __name__ == "__main__":
    main()
