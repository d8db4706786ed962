#!/usr/bin/env python
"""Decade datapoint for the round-7 additions: line_corpus_dedup and
doremi_domain_weights at 1x and 10x the sf0.1 corpus.

The 10x corpus is REPLICATED (per-replica doc ids offset; text
unchanged) — the adversarial case for LINE dedup: every replica's chunk
lines are exact duplicates of the originals, so the keeper groupBy sees
10x occurrences per key, and the planted footer key becomes a genuinely
hot key (~10 * N/7 occurrences). For DoReMi the replication holds the
vocabulary and domain models constant while the corpus-sized stages
(tokenize/explode, (domain,word) counts) grow 10x — exactly the shape a
real 100 TB run has (vocab-bounded state, corpus-bounded scans).

Usage: python scripts/scale_drill7.py   (run alone; timings are the point)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_drill7"
REPLICAS = 10


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.queries.corpus_ops import (
        doremi_domain_weights,
        line_corpus_dedup,
    )
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="scale-drill7")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load_table(spark, SRC, "documents")
    max_doc = docs1.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("__r"))
    docs10 = docs1.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * max_doc).alias("doc_id"),
        "text",
        "source",
        "lang",
        "n_chars",
    )
    ten_dir = f"{WORK}/sf1x10"
    docs10.write.mode("overwrite").parquet(f"{ten_dir}/documents.parquet")

    def timed(fn, sf_dir):
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        return round(best, 2), rows

    out = {}
    for name, fn in (
        ("line_corpus_dedup", line_corpus_dedup),
        ("doremi_domain_weights", doremi_domain_weights),
    ):
        t1, r1 = timed(fn, SRC)
        t10, r10 = timed(fn, ten_dir)
        out[name] = {
            "sec_1x": t1,
            "sec_10x": t10,
            "ratio": round(t10 / t1, 2),
            "rows_1x": len(r1),
            "rows_10x": len(r10),
        }
        if name == "line_corpus_dedup":
            # sanity: at 10x replication, all replica lines are dups —
            # global kept_lines must equal the 1x kept count (one keeper
            # per distinct line, replication adds no new lines)
            k1 = sum(r["kept_lines"] for r in r1)
            k10 = sum(r["kept_lines"] for r in r10)
            d10 = sum(r["dup_lines"] for r in r10)
            out[name]["kept_1x"] = k1
            out[name]["kept_10x"] = k10
            out[name]["dup_10x"] = d10
            out[name]["kept_invariant"] = k10 == k1
        else:
            # replication leaves every domain unigram unchanged, so the
            # final weights must be IDENTICAL to the 1x run
            w1 = sorted((r["domain"], r["alpha_e6"]) for r in r1)
            w10 = sorted((r["domain"], r["alpha_e6"]) for r in r10)
            out[name]["weights_invariant"] = w1 == w10
        print(name, json.dumps(out[name]))

    Path("SCALE_DRILL7.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
