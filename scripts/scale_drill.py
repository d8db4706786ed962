#!/usr/bin/env python
"""Scale drill: replicate sf0.1 tenfold into an sf1-like dataset (in /tmp,
with key remapping so joins keep realistic fan-out instead of degenerate
duplicate keys) and measure warm per-query wall-clock ratios vs sf0.1 for
the slowest bench queries. VERDICT r2 item 4: one more decade beyond the
10x events probe, recorded in SCALE.md.

Key remapping per replica r (0 = the original rows):
  customer/orders      c_custkey/o_custkey  += r * (max_custkey + 1)
  orders/lineitem      o_orderkey/l_orderkey+= r * (max_orderkey + 1)
  part/lineitem        p_partkey/l_partkey  += r * (max_partkey + 1)
  supplier/lineitem    s_suppkey/l_suppkey  += r * (max_suppkey + 1)
  events               event_id/user_id offset, ts += r days
  documents            doc_id offset, text gets a per-replica suffix so
                       the corpus does not become 90% exact duplicates
  embeddings           vec_id offset, first component nudged per replica
region/nation are dimensions and copy once.

Usage: python scripts/scale_drill.py [--rebuild] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"
DRILL = "/tmp/spark_graft_sf1"
REPLICAS = 10


def build(spark) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    src = {
        t: spark.read.parquet(f"{SF01}/{t}.parquet")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    offs = {
        k: src[t].agg(F.max(k)).first()[0] + 1
        for t, k in (
            ("customer", "c_custkey"),
            ("orders", "o_orderkey"),
            ("part", "p_partkey"),
            ("supplier", "s_suppkey"),
            ("events", "event_id"),
            ("events", "user_id"),
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        )
    }

    def reps(df, cols_shift, extra=None):
        r = spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))
        out = df.crossJoin(F.broadcast(r))
        for c, step in cols_shift.items():
            out = out.withColumn(
                c, F.col(c) + F.col("__r").cast("long") * F.lit(step)
            )
        if extra is not None:
            out = extra(out)
        return out.drop("__r")

    plans = {
        "region": src["region"],
        "nation": src["nation"],
        "customer": reps(src["customer"], {"c_custkey": offs["c_custkey"]}),
        "supplier": reps(src["supplier"], {"s_suppkey": offs["s_suppkey"]}),
        "part": reps(src["part"], {"p_partkey": offs["p_partkey"]}),
        "orders": reps(
            src["orders"],
            {"o_orderkey": offs["o_orderkey"], "o_custkey": offs["c_custkey"]},
        ),
        "lineitem": reps(
            src["lineitem"],
            {
                "l_orderkey": offs["o_orderkey"],
                "l_partkey": offs["p_partkey"],
                "l_suppkey": offs["s_suppkey"],
            },
        ),
        "events": reps(
            src["events"],
            {"event_id": offs["event_id"], "user_id": offs["user_id"]},
            extra=lambda d: d.withColumn(
                "ts",
                (
                    F.col("ts").cast("timestamp")
                    + F.make_dt_interval(F.col("__r").cast("int"))
                ),
            ),
        ),
        "documents": reps(
            src["documents"],
            {"doc_id": offs["doc_id"]},
            extra=lambda d: d.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" replica "),
                        F.col("__r").cast("string"),
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long")),
        ),
        "embeddings": reps(
            src["embeddings"],
            {"vec_id": offs["vec_id"]},
            extra=lambda d: d.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + F.when(i == 0, F.col("__r").cast("float") * F.lit(1e-4))
                    .otherwise(F.lit(0.0))
                    .cast("float"),
                ),
            ),
        ),
    }
    for t, df in plans.items():
        df.write.mode("overwrite").parquet(f"{DRILL}/{t}.parquet")
        print(f"built {t}", flush=True)


def main(argv: list[str]) -> int:
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    rebuild = "--rebuild" in argv
    only = [a for a in argv if not a.startswith("--")]

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("scale-drill")
        .getOrCreate()
    )
    if rebuild or not Path(DRILL, "lineitem.parquet").exists():
        t0 = time.time()
        build(spark)
        print(f"build took {time.time() - t0:.1f}s", flush=True)

    qs = E.queries()
    if only:
        names = only
    else:
        ranked = sorted(
            json.load(open(Path(__file__).parent.parent / "bench_queries.json")).items(),
            key=lambda kv: -kv[1],
        )
        names = [n for n, _ in ranked[:10]]

    def run(name, sf_dir):
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        return time.time() - t0, n

    print(f"\n| query | sf0.1 s | sf1 s | ratio | sf1 rows |")
    print("|---|---|---|---|---|")
    results = {}
    for name in names:
        run(name, SF01)             # warm code paths
        base, _ = run(name, SF01)
        big, nrows = run(name, DRILL)
        ratio = big / base if base > 0 else float("inf")
        results[name] = (base, big, ratio)
        print(
            f"| {name} | {base:.2f} | {big:.2f} | {ratio:.1f}x | {nrows} |",
            flush=True,
        )
    worst = max(results.items(), key=lambda kv: kv[1][2])
    print(f"\nworst ratio: {worst[0]} at {worst[1][2]:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
