#!/usr/bin/env python
"""Decade datapoint for the round-7 second-session additions:
ccnet_perplexity_buckets, embedding_kmeans_fixedpoint, and
stratified_sample_exact at 1x and 10x the sf0.1 tables.

The 10x corpora are REPLICATED (ids offset per replica, payloads
unchanged), which gives each operator a falsifiable 10x contract:

* kmeans — truncating division of the same rational is replication-
  invariant ((10S*1024) div (10n) == (S*1024) div n), so the final
  centroids must be BIT-IDENTICAL while n_members and sum_dist scale by
  exactly 10 and min_member stays (replica 0 holds the original ids).
* ccnet — the trigram model's probabilities barely move (counts and T
  scale 10x; only the +1 smoothing and D stay), and the tertile cut is
  rank-based, so each (lang, bucket) doc count must be 10x within the
  +-1-per-bucket integer-cut slack.
* stratified — quotas re-derive from 10x counts; the drawn total is
  exactly (2*10N)//5 and the per-source split stays within one row of
  proportional (allocation invariant), while the cost is one window
  over 10x rows.

Usage: python scripts/scale_drill8.py   (run alone; timings are the point)
Writes SCALE_DRILL8.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill8"
REPLICAS = 10


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.queries.corpus_ops import (
        QUERIES as CQ,
    )
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill8")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents")
    max_doc = docs1.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    ten = f"{WORK}/x10"
    docs1.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * max_doc).alias("doc_id"),
        "text",
        "source",
        "lang",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{ten}/documents.parquet")
    emb1 = load_table(spark, SRC, "embeddings")
    max_vec = emb1.agg(F.max("vec_id")).first()[0] + 1
    emb1.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("__r") * max_vec).alias("vec_id"),
        "embedding",
        "label",
    ).write.mode("overwrite").parquet(f"{ten}/embeddings.parquet")

    def timed(fn, sf_dir):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        return round(best, 2), rows

    out = {}
    for name in (
        "embedding_kmeans_fixedpoint",
        "ccnet_perplexity_buckets",
        "stratified_sample_exact",
    ):
        t1, r1 = timed(CQ[name], SRC)
        t10, r10 = timed(CQ[name], ten)
        rec = {
            "sec_1x": t1,
            "sec_10x": t10,
            "ratio": round(t10 / t1, 2),
            "rows_1x": len(r1),
            "rows_10x": len(r10),
        }
        if name == "embedding_kmeans_fixedpoint":
            a = {r["cluster"]: r for r in r1}
            b = {r["cluster"]: r for r in r10}
            rec["centroids_identical"] = all(
                a[c]["centroid_sum"] == b[c]["centroid_sum"] for c in a
            )
            rec["counts_x10_exact"] = all(
                b[c]["n_members"] == 10 * a[c]["n_members"]
                and b[c]["sum_dist"] == 10 * a[c]["sum_dist"]
                and b[c]["min_member"] == a[c]["min_member"]
                for c in a
            )
            assert rec["centroids_identical"] and rec["counts_x10_exact"], rec
        elif name == "ccnet_perplexity_buckets":
            a = {(r["lang"], r["bucket"]): r["n_docs"] for r in r1}
            b = {(r["lang"], r["bucket"]): r["n_docs"] for r in r10}
            rec["buckets_x10_within_1"] = all(
                abs(b[k] - 10 * a[k]) <= 10 for k in a
            )
            assert rec["buckets_x10_within_1"], (a, b)
        else:
            rec["total_exact"] = (
                len(r10) == 10 * len(r1) or abs(len(r10) - 10 * len(r1)) <= 4
            )
            assert rec["total_exact"], (len(r1), len(r10))
        out[name] = rec
        print(name, rec, flush=True)

    Path("SCALE_DRILL8.json").write_text(
        json.dumps({"replicas": REPLICAS, "src": SRC, "results": out}, indent=1)
    )
    print("wrote SCALE_DRILL8.json")


if __name__ == "__main__":
    main()
