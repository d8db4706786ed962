#!/usr/bin/env python
"""Decade datapoint for the round-6 FLAGSHIP: corpus_prep_funnel_v3
(quality -> Gopher repetition -> language -> exact dedup -> near-dup
keep-one -> decontamination -> packing) at 1x and 10x the sf0.1 corpus
(replicated docs with a per-replica tail token — near-duplicated 10x,
the adversarial case for the dedup stages). Min-of-2 warm; the funnel
already materializes through its own aggregates.

Usage: python scripts/scale_drill6.py  (run alone)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill6"
REPLICAS = 10


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.queries.pipeline_ops import (
        corpus_prep_funnel_v3,
    )
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill6")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents")
    max_doc = docs1.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    docs10 = docs1.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * max_doc).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" tail"), F.col("__r").cast("string")
        ).alias("text"),
        "source",
        "lang",
        "n_chars",
    )
    ten_dir = f"{WORK}/sf1x10"
    docs10.write.mode("overwrite").parquet(f"{ten_dir}/documents.parquet")
    # the funnel only reads documents; other tables aren't touched
    def timed(sf_dir):
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = corpus_prep_funnel_v3(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        return best, rows

    t1, r1 = timed(SRC)
    t10, r10 = timed(ten_dir)
    print(f"| funnel_v3 | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}x |")
    for tag, rows in (("1x", r1), ("10x", r10)):
        print(tag, [(r["name"], r["n_docs"]) for r in rows])


if __name__ == "__main__":
    main()
