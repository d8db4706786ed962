#!/usr/bin/env python
"""Second decade drill (VERDICT r3 item 4): replicate the sf1 drill set
ANOTHER tenfold (sf10-like) for exactly the tables the three flagged
lifecycle queries read — documents (near_dedup_fold), embeddings
(ann_topk_ivf_index), lineitem (market_basket_rules) — and measure warm
wall-clock ratios sf1 -> sf10. Purpose: confirm the n log n sort and
index/rewrite costs stay inside their envelopes where spill begins, one
decade beyond SCALE.md's sf0.1 -> sf1 table.

Key remapping mirrors scripts/scale_drill.py (offsets keep joins
realistic; document text gets a per-replica suffix so the corpus does not
become 90% exact duplicates; embeddings get a first-component nudge).

Usage: python scripts/scale_drill2.py [--rebuild]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF1 = "/tmp/spark_graft_sf1"      # built by scale_drill.py
SF10 = "/tmp/spark_graft_sf10"
REPLICAS = 10
QUERIES = ["near_dedup_fold", "ann_topk_ivf_index", "market_basket_rules"]
TABLES = ["documents", "embeddings", "lineitem"]


def build(spark) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    src = {t: spark.read.parquet(f"{SF1}/{t}.parquet") for t in TABLES}
    offs = {
        "doc_id": src["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vec_id": src["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
        "l_orderkey": src["lineitem"].agg(F.max("l_orderkey")).first()[0] + 1,
        "l_partkey": src["lineitem"].agg(F.max("l_partkey")).first()[0] + 1,
        "l_suppkey": src["lineitem"].agg(F.max("l_suppkey")).first()[0] + 1,
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
        "lineitem": reps(
            src["lineitem"],
            {
                "l_orderkey": offs["l_orderkey"],
                "l_partkey": offs["l_partkey"],
                "l_suppkey": offs["l_suppkey"],
            },
        ),
        "documents": reps(
            src["documents"],
            {"doc_id": offs["doc_id"]},
            extra=lambda d: d.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" decade "),
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
                    + F.when(i == 0, F.col("__r").cast("float") * F.lit(3e-4))
                    .otherwise(F.lit(0.0))
                    .cast("float"),
                ),
            ),
        ),
    }
    for t, df in plans.items():
        df.write.mode("overwrite").parquet(f"{SF10}/{t}.parquet")
        print(f"built {t}", flush=True)
    # the drill queries only read TABLES, but load_table guards need the
    # dimension files present: symlink the rest from sf1
    import os

    for t in (
        "region nation customer supplier part orders events".split()
    ):
        dst = Path(SF10, f"{t}.parquet")
        if not dst.exists():
            os.symlink(f"{SF1}/{t}.parquet", dst)


def main(argv: list[str]) -> int:
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    rebuild = "--rebuild" in argv
    only = [a for a in argv if not a.startswith("--")]
    queries = only or QUERIES
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("scale-drill-2")
        .getOrCreate()
    )
    if not Path(SF1, "lineitem.parquet").exists():
        print("sf1 drill set missing — run scripts/scale_drill.py first")
        return 1
    if rebuild or not Path(SF10, "lineitem.parquet").exists():
        t0 = time.time()
        build(spark)
        print(f"build took {time.time() - t0:.1f}s", flush=True)

    qs = E.queries()

    def _ivf_fixed_queries(spark_, sf_dir):
        # The registered ann_topk_ivf_index query searches with 10% of the
        # corpus as queries — a workload that grows quadratically with sf
        # (already audited in SCALE.md r3). The decade drill instead
        # measures the production shape: index 10x more vectors, SAME
        # query traffic (500 fixed queries, full probe).
        import tempfile

        from pyspark.sql import functions as F

        from cdc_application_febuary_spark.operators import vector_index as vi

        emb = spark_.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = (
            emb.where(F.col("vec_id") % 10 == 0)
            .orderBy("vec_id")
            .limit(500)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        t = tempfile.mkdtemp(prefix="drill_ivf_") + "/idx"
        vi.build_ivf_index(emb, t, n_centroids=16)
        out = vi.search_ivf_index(
            spark_, t, queries, k=5, n_probe=16
        )["result"]
        return out

    def run(name, sf_dir):
        t0 = time.time()
        if name == "ann_topk_ivf_index":
            n = _ivf_fixed_queries(spark, sf_dir).count()
        else:
            n = qs[name](spark, sf_dir).count()
        return time.time() - t0, n

    print("\n| query | sf1 s | sf10 s | ratio | sf10 rows |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for name in queries:
        run(name, SF1)              # warm code paths
        base, _ = run(name, SF1)
        big, nrows = run(name, SF10)
        ratio = big / base if base > 0 else float("inf")
        print(
            f"| {name} | {base:.2f} | {big:.2f} | {ratio:.1f}x | {nrows} |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
