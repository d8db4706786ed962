#!/usr/bin/env python
"""Plan-fingerprint regression gate (VERDICT r5 item 4).

The plan-audit tests pin individual properties (pushdown, 0-exchange,
no-BNLJ), but a silent plan regression — a broadcast flipping to
sort-merge when statistics change, a new exchange appearing — would only
show as a bench swing. This script snapshots a NORMALIZED physical-plan
fingerprint per registered query into `tests/plan_fingerprints.json`;
`tests/test_plan_fingerprints.py` fails on any unapproved diff.

Fingerprint = md5 of the pre-AQE physical plan's operator-name sequence
(preorder, tree art/expressions/literals/IDs stripped — join strategy
and operator structure stay, cosmetic drift doesn't). Queries whose
builders RUN lifecycles (streaming replays, index builds, Derby) are
fingerprinted too — their plans are the trivial reads of their result
artifacts, which is itself a stable shape — but heavyweight ones can be
skipped via SKIP to keep the gate fast.

Intentional-change workflow (documented in NOTES.md): when a plan change
is deliberate, re-run `python scripts/plan_fingerprints.py` and commit
the updated JSON alongside the code change; the diff in review IS the
approval record.

Usage:
  python scripts/plan_fingerprints.py            # regenerate all
  python scripts/plan_fingerprints.py q1 q7      # regenerate named only
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
OUT = Path(__file__).resolve().parent.parent / "tests" / "plan_fingerprints.json"

# Lifecycle builders that replay multi-batch streams or external services:
# their result plans are trivial artifact reads and each build costs tens
# of seconds — excluded to keep the gate proportionate (their behavior is
# value-oracled by the driver instead).
SKIP = {
    "stream_windowed_counts",
    "stream_join_enrichment",
    "stream_stream_attribution",
    "stream_stream_left_outer",
    "stream_dedup_report",
    "stateful_totals_v2",
    "stateful_running_counts",
    "pipeline_lifecycle_derby",
    "incremental_semdedup_fold",
    "incremental_dedup_fold",
    "incremental_line_dedup_fold",
    "near_dedup_fold",
    "ann_topk_ivf_recluster",
    "stream_quality_gate",
    "incremental_sketch_fold",
    "embedding_kmeans_fixedpoint",
    "stream_drift_gate",
    "stream_state_metrics_report",
    "stream_windowed_hll_distinct",
    "multi_pipeline_concurrent",
}

_NODE_RE = re.compile(r"^[\s:+\-*>()\d]*([A-Za-z][A-Za-z0-9]*)")


def normalize(plan: str) -> list[str]:
    """Operator-name sequence: strip tree art, codegen stage ids,
    expressions, literals, plan ids."""
    names = []
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        # WholeStageCodegen (1) prints as its own line; keep it — span
        # boundaries are part of the shape — but drop the stage number.
        names.append(name)
    return names


def fingerprint(df) -> str:
    plan = df._jdf.queryExecution().sparkPlan().toString()
    seq = normalize(plan)
    return hashlib.md5("\n".join(seq).encode()).hexdigest()[:16]


def main() -> None:
    import __spark_entry__ as entrymod
    from cdc_application_febuary_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="plan-fingerprints")
    spark.sparkContext.setLogLevel("ERROR")

    existing = {}
    if OUT.exists():
        existing = json.loads(OUT.read_text())

    qs = entrymod.queries()
    out = dict(existing)
    n_done = 0
    for name, fn in qs.items():
        if name in SKIP:
            continue
        if only and name not in only:
            continue
        try:
            fp = fingerprint(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        status = (
            "new" if name not in existing
            else ("CHANGED" if existing[name] != fp else "same")
        )
        out[name] = fp
        n_done += 1
        if status != "same":
            print(f"{name}: {status} {fp}")
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({n_done} fingerprinted, {len(out)} total)")


if __name__ == "__main__":
    main()
