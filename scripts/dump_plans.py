#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r10/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py --tag before q1 q2 ...
Lifecycle/streaming builders run their replay as a side effect of plan
construction; the dumped plan is the final returned frame's (what the
bench's noop sink executes)."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--outdir", default="plans/r10")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from cdc_application_febuary_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="dump-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = Path(__file__).resolve().parent.parent / args.outdir
    out.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{args.tag}.txt").write_text(plan)
        print(f"wrote {name}_{args.tag}.txt ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
