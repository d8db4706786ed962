#!/usr/bin/env python
"""Adjudicate the r7 funnel-family bench regression (VERDICT r8 item 1).

Runs conversion_funnel / conversion_funnel_windowed / corpus_prep_funnel
SOLO (no other queries in the JVM), min-of-5, under bench-identical session
setup, twice: (A) stock engine, (B) with ensure_package_on_workers disabled
— the only session-level change since the r5 per-query freeze. Prints a
JSON verdict per mode plus per-query stage counts from the Spark status
tracker so a scheduler-overhead explanation is checkable.
"""
import json
import os
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["conversion_funnel", "conversion_funnel_windowed", "corpus_prep_funnel",
           "user_sessions", "retention_cohorts"]


def run(mode: str) -> dict:
    from cdc_application_febuary_spark import session as S

    if mode == "noship":
        S._PKG_SHIPPED["__disabled__"] = True
        orig = S.ensure_package_on_workers
        S.ensure_package_on_workers = lambda spark: None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = S.get_spark(app_name=f"funnel-probe-{mode}",
                        master=f"local[{cpus}]",
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
    out = {}
    tracker = spark.sparkContext.statusTracker()
    for name in QUERIES:
        samples = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for _ in range(5):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 4))
        jobs_after = len(tracker.getJobIdsForGroup(None) or [])
        out[name] = {
            "min": min(samples),
            "samples": samples,
            "jobs_5runs": jobs_after - jobs_before,
        }
    spark.stop()
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stock"
    print(json.dumps({"mode": mode, "results": run(mode)}))
