#!/usr/bin/env python
"""Multi-JVM validation run (VERDICT r6 item 2): execute the most
expensive registry queries under `local-cluster[2,8,8192]` — two REAL
executor processes, real serialization boundaries, real Python-worker
shipping — and compare both VALUES (order-independent row canon) and
wall time against a same-parallelism single-JVM `local[16]` run.

Every scale claim before r7 was same-JVM local[32]; the behaviors that
differ with real executors are exactly the risk sites this run covers:
broadcast threshold handling, shuffle serialization, the protobuf worker
bridge (`ensure_protobuf_on_workers` addPyFile path, exercised by
stateful_totals_v2), and the manifest-sink commit protocol (exercised by
the fold/recluster lifecycles, which commit from executor-written files).

Usage:
    python scripts/local_cluster_run.py [query ...]   # default: top set
Writes LOCALCLUSTER_r07.json and prints one summary line per query.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("LC_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("LC_OUT", "LOCALCLUSTER_r07.json")

# top-of-bench queries + the protobuf/streaming/manifest risk sites
DEFAULT = [
    "stream_stream_left_outer",      # 6-batch watermark lifecycle
    "stream_stream_attribution",
    "pagerank_parts",
    "ann_topk_ivf_recluster",        # manifest exactly-once appends
    "stream_windowed_counts",
    "near_dedup_fold",               # band store lifecycle
    "corpus_prep_funnel_v3",
    "stream_dedup_report",
    "quality_classifier",
    "dedup_simhash_portable",
    "ann_topk_ivf_append",
    "incremental_semdedup_fold",
    "corpus_prep_funnel_v2",
    "value_quantile_sketch",
    "lm_perplexity_profile",
    "stateful_totals_v2",            # transformWithState / protobuf bridge
    "gopher_repetition_report",
    "doc_entropy_filter",
    "change_feed_attribution",
    "triangle_copurchase",
    "stream_quality_gate",           # foreachBatch idempotent sink
]


def canon(v):
    if v is None:
        return "<N>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def run_mode(master: str, names: list[str]) -> dict:
    from pyspark.sql import SparkSession

    from cdc_application_febuary_spark.queries import all_queries

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName(f"lc-run-{master.split('[')[0]}")
        .getOrCreate()
    )
    qs = all_queries()
    out: dict = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            cols = sorted(sdf.columns)
            rows = sorted(
                tuple(canon(r[c]) for c in cols) for r in sdf.collect()
            )
            cold = round(time.time() - t0, 2)
            # second, warm run: JIT/codegen/classloading settled — the
            # steady-state number a long-lived cluster job would see
            # (triangle_copurchase measured 112 s cold vs 10 s warm in a
            # fresh JVM, so cold-only ratios are mostly warm-up noise)
            t1 = time.time()
            qs[name](spark, SF).collect()
            warm = round(time.time() - t1, 2)
            out[name] = {
                "sec": cold,
                "warm_sec": warm,
                "rows": len(rows),
                "digest": hash(tuple(rows)) & 0xFFFFFFFFFFFF,
                "err": None,
            }
        except Exception as e:  # noqa: BLE001 - per-query isolation
            out[name] = {
                "sec": round(time.time() - t0, 2),
                "warm_sec": None,
                "rows": -1,
                "digest": None,
                "err": f"{type(e).__name__}: {str(e)[:300]}",
            }
        print(f"  {master:>24s} {name}: {out[name]['sec']}s "
              f"warm={out[name]['warm_sec']}s rows={out[name]['rows']}"
              + (f" ERR={out[name]['err']}" if out[name]["err"] else ""))
    spark.stop()
    return out


def main(only: list[str]) -> int:
    if only == ["--all"]:
        from cdc_application_febuary_spark.queries import all_queries

        names = sorted(all_queries())
    else:
        names = only or DEFAULT
    print("== local[16] (single JVM, same parallelism) ==")
    single = run_mode("local[16]", names)
    print("== local-cluster[2,8,8192] (two executor JVMs) ==")
    cluster = run_mode("local-cluster[2,8,8192]", names)
    report = {"sf": SF, "queries": {}}
    bad = 0
    for n in names:
        s, c = single[n], cluster[n]
        values_match = (
            s["err"] is None
            and c["err"] is None
            and s["rows"] == c["rows"]
            and s["digest"] == c["digest"]
        )
        if not values_match:
            bad += 1
        report["queries"][n] = {
            "local16_sec": s["sec"],
            "cluster_sec": c["sec"],
            "local16_warm_sec": s["warm_sec"],
            "cluster_warm_sec": c["warm_sec"],
            "ratio": round(c["sec"] / s["sec"], 2) if s["sec"] else None,
            "warm_ratio": (
                round(c["warm_sec"] / s["warm_sec"], 2)
                if s.get("warm_sec") and c.get("warm_sec")
                else None
            ),
            "rows": s["rows"],
            "values_match": values_match,
            "err_local": s["err"],
            "err_cluster": c["err"],
        }
    report["n_queries"] = len(names)
    report["n_mismatch_or_error"] = bad
    Path(OUT).write_text(json.dumps(report, indent=1))
    print(json.dumps({
        "n": len(names), "bad": bad,
        "total_local16": round(sum(single[n]["sec"] for n in names), 1),
        "total_cluster": round(sum(cluster[n]["sec"] for n in names), 1),
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
