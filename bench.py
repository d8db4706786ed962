#!/usr/bin/env python
"""Benchmark: run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...slowest 5...}, "sf": ..., "query_count": N,
"queries_file": path}. The full per-query map goes to the sidecar
bench_queries.json (round 1's all-91-query line was too long for the
driver's capture — BENCH_r01.json recorded parsed:null).

Timing is per-query wall-clock of plan construction + execution to
completion via a noop-sink write, which materializes every column of every
row (a count() would let Catalyst prune agg expressions the row count
doesn't need — see the inline comment); the time measured is the
distributed work, not driver materialization.

Contention-proofing (VERDICT r4 item 2): each query runs K times
($SPARK_GRAFT_BENCH_RUNS, default 3) and the reported figure is the MIN —
the steady-state time with JVM/memory-bandwidth contention (the documented
±50% swing) filtered out. All samples persist to bench_queries.json as
{"name": {"min": s, "samples": [...]}}; the headline total is the sum of
mins (what a clean serial run would cost), with the raw wall-clock kept in
"wall_clock_sec" for honesty.

Standing regression ledger (VERDICT r8 item 1): every run compares its
per-query mins against the frozen base ledger ($SPARK_GRAFT_BENCH_BASE,
default BENCHQ_r10.json — the r10 solo min-of-5 freeze; re-point when a
round re-freezes). The carried-query median ratio and every query over
1.5x its base min land in the sidecar BENCH_RATIOS.json and as
"carried_median_vs_base" / "over_1_5x_count" in the headline line, so a
regression surfaces as a computed artifact instead of judge archaeology.
Adjudication discipline for entries on that list is the CLAUDE.md rule:
interleaved worktree min-of-5 before calling anything a code regression.
Runs at a non-base SF or core count divert to separately named
BENCH_RATIOS_sf<sf>.json / BENCH_RATIOS_c<cpus>.json files so they can
never clobber the standing 32-core sf0.1 ledger (ADVICE r9; VERDICT r10
item 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pandas as pd  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from cdc_application_febuary_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="cdc-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen/file-index paths so startup cost isn't billed to
    # whichever query happens to run first.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    # ... and the Python/Arrow worker pool (spark.python.worker.reuse keeps
    # them alive), so the first pandas-UDF query isn't billed the pool
    # spin-up either.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_pandas(s: pd.Series) -> pd.Series:
        return s

    spark.range(cpus * 4, numPartitions=cpus).select(
        _warm_pandas("id")
    ).collect()

    qs = E.queries()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    t_all = time.time()
    for name in sorted(qs):
        per_run: list[float] = []
        for _ in range(max(1, runs)):
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                # noop sink: consumes EVERY column of EVERY row. A bare
                # count() is not a valid harness — Catalyst prunes agg
                # expressions that don't affect the row count (verified:
                # count() over groupBy().agg(sum(x*x)) eliminates the sum
                # from the optimized plan), silently under-measuring any
                # query whose final ordering doesn't read the agg values.
                df.write.mode("overwrite").format("noop").save()
                per_run.append(round(time.time() - t0, 4))
            except Exception as e:  # a failing query must not hide the rest
                per_run.append(-1.0)
                print(f"bench error in {name}: {e}", file=sys.stderr)
                break
        samples[name] = per_run
        timings[name] = -1.0 if min(per_run) < 0 else min(per_run)
    wall = round(time.time() - t_all, 4)
    total = round(sum(v for v in timings.values() if v > 0), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    sidecar = Path(__file__).resolve().parent / "bench_queries.json"
    sidecar.write_text(
        json.dumps(
            {
                name: {"min": timings[name], "samples": samples[name]}
                for name in timings
            },
            indent=1,
            sort_keys=True,
        )
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    ratio_summary = _ratio_report(timings, sf_val, runs, cpus)
    print(
        json.dumps(
            {
                "metric": f"full query suite, sum of per-query min-of-{runs}",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "query_count": len(timings),
                "errors": sum(1 for v in timings.values() if v < 0),
                "runs_per_query": runs,
                "wall_clock_sec": wall,
                "sf": sf_val,
                "cpus": cpus,
                "queries_file": str(sidecar),
                **ratio_summary,
            }
        )
    )
    spark.stop()


def _ratio_report(
    timings: dict[str, float], sf_val, runs: int, cpus: int = 32
) -> dict:
    """Compare this run's per-query mins to the frozen base ledger; write
    the full table to BENCH_RATIOS.json and return headline fields.
    Ratios only make sense at the base's SF (0.1) and core count (32 —
    every BENCHQ_r* freeze is a solo 32-core sf0.1 run) and are noisy
    below min-of-5 — so the run's sf/cpus/samples-per-query are RECORDED
    in the report, and a run at any other SF or core count writes a
    separately named BENCH_RATIOS_sf<sf>.json / BENCH_RATIOS_c<cpus>.json
    instead of clobbering the standing ledger with incomparable ratios
    (ADVICE r9 for SF; VERDICT r10 item 3 for cpus — the driver's 8-core
    scaling run overwrote the 32-core ledger with 25 garbage flags)."""
    here = Path(__file__).resolve().parent
    base_name = os.environ.get("SPARK_GRAFT_BENCH_BASE", "BENCHQ_r10.json")
    base_path = here / base_name
    if not base_path.exists():
        return {}
    base_sf = 0.1  # every BENCHQ_r* freeze is a solo sf0.1 run
    base_cpus = 32  # ... at 32 cores
    cross_sf = sf_val != base_sf
    cross_cpu = int(cpus) != base_cpus
    if cross_sf:
        out_name = f"BENCH_RATIOS_sf{sf_val}.json"
    elif cross_cpu:
        out_name = f"BENCH_RATIOS_c{int(cpus)}.json"
    else:
        out_name = "BENCH_RATIOS.json"
    base = {
        k: v["min"] if isinstance(v, dict) else float(v)
        for k, v in json.loads(base_path.read_text()).items()
    }
    carried = sorted(
        k for k in timings if k in base and timings[k] > 0 and base[k] > 0
    )
    ratios = {k: round(timings[k] / base[k], 3) for k in carried}
    rs = sorted(ratios.values())
    if not rs:
        median = None
    elif len(rs) % 2:
        median = rs[len(rs) // 2]
    else:
        median = round((rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2, 3)
    over = {
        k: {"base": base[k], "now": timings[k], "ratio": ratios[k]}
        for k in carried
        if ratios[k] > 1.5
    }
    report = {
        "base_ledger": base_name,
        "base_sf": base_sf,
        "run_sf": sf_val,
        "base_cpus": base_cpus,
        "run_cpus": int(cpus),
        "runs_per_query": runs,
        "carried_queries": len(carried),
        "new_queries": sorted(set(timings) - set(base)),
        "retired_queries": sorted(set(base) - set(timings)),
        "carried_median_ratio": median,
        "over_1_5x": dict(
            sorted(over.items(), key=lambda kv: -kv[1]["ratio"])
        ),
        "note": (
            "mins from this run's samples; base is a solo min-of-5 freeze —"
            " adjudicate any entry via interleaved worktree min-of-5 before"
            " calling it a code regression (CLAUDE.md)"
        ),
    }
    if cross_sf:
        report["cross_sf_warning"] = (
            f"run sf={sf_val} differs from the base ledger's sf={base_sf};"
            " ratios are NOT comparable — standing BENCH_RATIOS.json left"
            " untouched"
        )
    elif cross_cpu:
        report["cross_cpu_warning"] = (
            f"run cpus={int(cpus)} differs from the base ledger's "
            f"cpus={base_cpus}; ratios are NOT comparable — standing"
            " BENCH_RATIOS.json left untouched"
        )
    (here / out_name).write_text(json.dumps(report, indent=1, sort_keys=False))
    return {
        "carried_median_vs_base": median,
        "over_1_5x_count": len(over),
        "ratios_file": str(here / out_name),
        **({"cross_sf_ratios": True} if cross_sf else {}),
        **({"cross_cpu_ratios": True} if (cross_cpu and not cross_sf) else {}),
    }


if __name__ == "__main__":
    main()
