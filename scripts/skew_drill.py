#!/usr/bin/env python
"""Skew drill (VERDICT r4 item 6): the decade drills replicate uniformly,
but real 100 TB event logs are Zipf-skewed. This drill builds an sf1-scale
events table TWICE over the same key space — uniform user_id vs Zipf(1.2)
user_id — plus a boilerplate-skewed document corpus, and measures:

  1. plain groupBy(user_id).count() vs the salted two-phase aggregation
     (operators/skew.two_phase_count) on both key distributions, with the
     hot-key share and the hottest-reducer row count (the quantity that
     becomes the straggler at 1000 executors);
  2. heavy_hitter_users' operator (operators/frequent.heavy_hitters) on
     both distributions;
  3. MinHash+LSH banding (operators/dedup.lsh_candidates) on a clean
     corpus vs one where 15% of docs share a 200-char site template —
     without and with the max_bucket hot-bucket cap.

Timings are min-of-2 (warm). Output: one markdown table on stdout, ready
to paste into SCALE.md.

Usage: python scripts/skew_drill.py [--replicas N]
"""

import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_skew"
ZIPF_S = 1.2


def timed(fn, runs: int = 2) -> tuple[float, object]:
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def build(spark, replicas: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from cdc_application_febuary_spark.catalog import load_table

    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    ev = load_table(spark, SRC, "events")
    n_users = ev.agg(F.countDistinct("user_id")).first()[0]
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1

    reps = spark.range(replicas).select(F.col("id").alias("__r"))
    big = ev.crossJoin(F.broadcast(reps)).withColumn(
        "event_id", F.col("event_id") + F.col("__r") * F.lit(max_eid)
    ).drop("__r")

    # Zipf(s) over the same K users, deterministic per event:
    # u = hash(event_id) uniform in [0,1) -> inverse-CDF lookup.
    probs = np.arange(1, n_users + 1, dtype=np.float64) ** (-ZIPF_S)
    cdf = np.cumsum(probs / probs.sum())

    @pandas_udf("long")
    def zipf_rank(u: pd.Series) -> pd.Series:
        return pd.Series(
            np.searchsorted(cdf, u.to_numpy(), side="right").astype("int64")
        )

    u = (F.pmod(F.xxhash64("event_id"), F.lit(1_000_000)) / 1_000_000.0)
    uniform = big
    zipf = big.withColumn("user_id", zipf_rank(u))
    for name, df in (("uniform", uniform), ("zipf", zipf)):
        df.write.mode("overwrite").parquet(f"{WORK}/{name}/events.parquet")

    # corpus: clean vs 15%-boilerplate (200-char shared template)
    docs = load_table(spark, SRC, "documents").select("doc_id", "text")
    boiler = (
        "This website uses cookies to ensure you get the best experience. "
        "By continuing to browse you agree to our terms of service and our "
        "privacy policy. Subscribe to our newsletter for weekly updates. "
    )
    hot = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(boiler), F.col("text"))
        ).otherwise(F.col("text")),
    )
    docs.write.mode("overwrite").parquet(f"{WORK}/clean_docs.parquet")
    hot.write.mode("overwrite").parquet(f"{WORK}/hot_docs.parquet")
    return {"n_users": n_users, "rows": big.count()}


def main() -> None:
    replicas = 10
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])

    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.operators import frequent
    from cdc_application_febuary_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )
    from cdc_application_febuary_spark.operators.skew import two_phase_count
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="skew-drill")
    spark.sparkContext.setLogLevel("ERROR")
    meta = build(spark, replicas)
    print(f"built: {meta['rows']} events x2 variants, K={meta['n_users']}")

    rows: list[tuple] = []
    stats: dict[str, dict] = {}
    for name in ("uniform", "zipf"):
        ev = spark.read.parquet(f"{WORK}/{name}/events.parquet")
        total = ev.count()
        top = (
            ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
        )
        # hottest reducer under a hash shuffle on user_id == hot key rows
        stats[name] = {
            "total": total,
            "top_share": top["count"] / total,
            "top_rows": top["count"],
        }
        t_plain, _ = timed(
            lambda e=ev: e.groupBy("user_id").count()
            .write.mode("overwrite").format("noop").save()
        )
        t_salted, _ = timed(
            lambda e=ev: two_phase_count(e, ["user_id"], salts=32)
            .write.mode("overwrite").format("noop").save()
        )
        t_hh, hh = timed(
            lambda e=ev: frequent.heavy_hitters(e, "user_id", 140).count()
        )
        rows.append(
            (
                name,
                f"{stats[name]['top_share']:.3%}",
                stats[name]["top_rows"],
                f"{t_plain:.2f}",
                f"{t_salted:.2f}",
                f"{t_hh:.2f} ({hh} hitters)",
            )
        )

    print("\n| variant | top-key share | hottest-reducer rows | "
          "plain groupBy s | salted 2-phase s | heavy_hitters s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    print(
        "\nNote: count-style groupBy is skew-immune by map-side combine "
        "(partial aggregation collapses the hot key per task before the "
        "shuffle); the hottest-reducer column is what matters for "
        "non-combinable state and joins — measured next."
    )

    # skew-sensitive leg: shuffle join events x per-user dimension.
    # Broadcast would hide the skew (the dimension is tiny), so force a
    # sort-merge join — the shape a broadcast-ineligible dimension takes.
    print("\n| variant | merge join (AQE skew-split) s | "
          "merge join (AQE off) s | salted_join s |")
    print("|---|---|---|---|")
    from cdc_application_febuary_spark.operators.skew import salted_join

    for name in ("uniform", "zipf"):
        ev = spark.read.parquet(f"{WORK}/{name}/events.parquet").select(
            "event_id", "user_id"
        )
        dim = (
            ev.select("user_id").distinct()
            .withColumn("tier", F.pmod("user_id", F.lit(5)))
        )
        def merge_join():
            return (
                ev.join(dim.hint("merge"), "user_id")
                .write.mode("overwrite").format("noop").save()
            )

        t_aqe, _ = timed(merge_join)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        t_noaqe, _ = timed(merge_join)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        t_salt, _ = timed(
            lambda: salted_join(ev, dim, ["user_id"], salts=32)
            .write.mode("overwrite").format("noop").save()
        )
        print(f"| {name} | {t_aqe:.2f} | {t_noaqe:.2f} | {t_salt:.2f} |")

    print("\nLSH banding under boilerplate skew:")
    print("| corpus | max_bucket | candidate pairs | biggest bucket | s |")
    print("|---|---|---|---|---|")
    for corpus in ("clean", "hot"):
        docs = spark.read.parquet(f"{WORK}/{corpus}_docs.parquet")
        sigs = minhash_signatures(docs, "doc_id", "text").persist()
        sigs.count()
        from cdc_application_febuary_spark.operators.dedup import band_table

        biggest = (
            band_table(sigs)
            .groupBy("band", "bucket")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        for cap in (None, 200):
            if corpus == "clean" and cap is not None:
                continue  # cap is a no-op on the clean corpus
            t, n = timed(
                lambda s=sigs, c=cap: lsh_candidates(s, max_bucket=c).count()
            )
            rows_out = (corpus, cap or "—", n, biggest, f"{t:.2f}")
            print("| " + " | ".join(str(x) for x in rows_out) + " |")
        sigs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
