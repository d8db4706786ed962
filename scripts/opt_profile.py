#!/usr/bin/env python
"""Optimization-round profiler (guide §1: measure first).

For each named query, in one persistent tuned session, measures:
  - t_build: wall time of the builder fn(spark, sf_dir) — for lifecycle/
    streaming-replay queries this is the whole replay (feeds, stream,
    index builds, collects); for plain queries it is plan construction.
  - t_exec: wall time of the noop-sink write of the returned DataFrame
    (the distributed computation of the final result).
  - jobs/stages/tasks executed during each phase (StatusTracker deltas).

Each query runs --runs times (default 2); the MIN per phase is reported
(CLAUDE.md: warm per-query timings are the signal). Output: one JSON line
per query to stdout + a combined JSON artifact at --out.

Usage: python scripts/opt_profile.py [--runs N] [--out FILE] q1 q2 ...
       python scripts/opt_profile.py --top 25   (slowest 25 from BENCHQ_r10)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--out", default="/tmp/opt_profile.json")
    ap.add_argument("--base", default="BENCHQ_r10.json")
    args = ap.parse_args()

    here = Path(__file__).resolve().parent.parent
    names = list(args.queries)
    base = {}
    bp = here / args.base
    if bp.exists():
        base = {
            k: (v["min"] if isinstance(v, dict) else v)
            for k, v in json.loads(bp.read_text()).items()
        }
    if args.top:
        names += [
            k
            for k, _ in sorted(base.items(), key=lambda kv: -kv[1])[: args.top]
            if k not in names
        ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from cdc_application_febuary_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="opt-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(cpus * 4, numPartitions=cpus).select(_warm("id")).collect()

    qs = E.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        names = [n for n in names if n in qs]

    results = {}
    for run_i_name in names:
        name = run_i_name
        recs = []
        for ri in range(max(1, args.runs)):
            gb = f"profile:{name}:build:{ri}"
            ge = f"profile:{name}:exec:{ri}"
            sc.setJobGroup(gb, gb)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            sc.setJobGroup(ge, ge)
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            sc.setJobGroup("profile:idle", "idle")
            recs.append(
                {
                    "t_build": round(t1 - t0, 3),
                    "t_exec": round(t2 - t1, 3),
                    "jobs_build": len(tracker.getJobIdsForGroup(gb) or []),
                    "jobs_exec": len(tracker.getJobIdsForGroup(ge) or []),
                }
            )
        best = min(range(len(recs)), key=lambda i: recs[i]["t_build"] + recs[i]["t_exec"])
        r = dict(recs[best])
        r["t_total"] = round(r["t_build"] + r["t_exec"], 3)
        r["base_min"] = base.get(name)
        r["samples"] = recs
        results[name] = r
        print(json.dumps({"query": name, **{k: r[k] for k in ("t_build", "t_exec", "t_total", "jobs_build", "jobs_exec", "base_min")}}), flush=True)

    Path(args.out).write_text(json.dumps(results, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
