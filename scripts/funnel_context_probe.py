#!/usr/bin/env python
"""Phase 2 of the funnel-regression adjudication: reproduce the full-suite
JVM context. Run the N alphabetically-prior registry queries once each
(exactly what bench.py's sorted loop does before reaching conversion_*),
then time the funnel family min-of-3. If the adder reappears, the cause is
accumulated same-JVM state, not the queries; GC totals from the JVM MX
beans are printed before/after to test the memory-pressure hypothesis.
"""
import json
import os
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TARGETS = ["conversion_funnel", "conversion_funnel_windowed",
           "corpus_prep_funnel", "user_sessions", "retention_cohorts"]


def gc_stats(spark):
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    t = c = 0
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime()
        c += b.getCollectionCount()
    return {"gc_ms": t, "gc_count": c}


def main():
    n_prior = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    from cdc_application_febuary_spark.session import get_spark

    spark = get_spark(app_name="funnel-ctx-probe", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(cpus * 4, numPartitions=cpus).select(_warm("id")).collect()

    import __spark_entry__ as E

    qs = E.queries()
    prior = [n for n in sorted(qs) if n < "conversion_funnel"][:n_prior]
    print(json.dumps({"phase": "baseline-gc", **gc_stats(spark)}),
          file=sys.stderr)
    prior_runs = int(os.environ.get("PRIOR_RUNS", "1"))
    t0 = time.time()
    for name in prior:
        for _ in range(prior_runs):
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
    warm_t = round(time.time() - t0, 1)
    print(json.dumps({"phase": "after-prior", "n_prior": len(prior),
                      "prior_sec": warm_t, **gc_stats(spark)}),
          file=sys.stderr)
    out = {}
    for name in TARGETS:
        samples = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 4))
        out[name] = {"min": min(samples), "samples": samples}
    res = {"n_prior": len(prior), "prior_sec": warm_t,
           "results": out, **gc_stats(spark)}
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
