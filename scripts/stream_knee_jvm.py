#!/usr/bin/env python
"""Engine-side streaming saturation knee (VERDICT r6 item 3).

The r6 knee hunt (`scripts/stream_knee.py`) was honest that its ceiling
was the PYTHON FEED GENERATOR (~72-89k effective ev/s), not the engine.
This variant removes Python from the feed path entirely: a
`rate-micro-batch` source emits (timestamp, value) rows inside the JVM,
and the Debezium envelope JSON is synthesized IN-PLAN with `concat` — a
pure column expression — before entering the exact same
changelog-decode -> SCD2-merge -> parquet-commit pipeline
(`streaming/changelog_stream.start_changelog_stream`). The first Python
byte in the path is the foreachBatch driver callback, which is
orchestration, not data.

rate-micro-batch is a DETERMINISTIC replay source: every batch carries
exactly rowsPerBatch rows no matter how late the engine runs, so
saturation shows up as batch time > trigger interval, i.e. achieved
events/sec < the configured rate. Per tier we report:

  * achieved_eps (rows committed / wall time) vs rate_eps;
  * visible_eps (rows READABLE in the SCD2 target / wall time) — the
    end-to-end number;
  * stage attribution from StreamingQueryProgress.durationMs (addBatch =
    SCD2 merge + parquet commit; latestOffset; walCommit/commitOffsets);
  * keeping_up = achieved_eps >= 0.9 * rate_eps.

Unlike a file source (which batches UP when behind — adaptive batch
sizing amortizes the fixed per-batch cost), rate-micro-batch delivers a
FIXED rowsPerBatch, so each tier also measures a batch SIZE: the
per-batch fixed cost (SCD2 merge + parquet commit + event-log append,
~0.7-1 s in this container) bounds throughput at rowsPerBatch /
batch_time. The sweep therefore runs EVERY tier (no early stop): the
achieved-eps curve over batch size is the engine's capacity profile,
and its maximum is the honest sustainable-throughput number. Emits one
JSON line; also STREAMKNEE_r{N}.json when SPARK_GRAFT_ROUND is set.
Run alone.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RATES = [
    int(r)
    for r in os.environ.get(
        "SPARK_GRAFT_KNEE_RATES",
        "50000,100000,200000,400000,800000,1600000",
    ).split(",")
]
SECS = int(os.environ.get("SPARK_GRAFT_KNEE_SECS", "40"))
TRIGGER_MS = 500


def jvm_envelope_source(spark, rate: int):
    """rate-micro-batch -> Debezium envelope rows, all JVM expressions."""
    from pyspark.sql import functions as F

    rows_per_batch = max(1, int(rate * TRIGGER_MS / 1000))
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("startTimestamp", "0")
        .option("advanceMillisPerBatch", str(TRIGGER_MS))
        .load()
    )
    v = F.col("value").cast("string")
    ts = (F.unix_millis(F.col("timestamp"))).cast("string")
    envelope = F.concat(
        F.lit('{"payload": {"before": null, "after": {"id": '),
        v,
        F.lit(', "name": "row-'),
        v,
        F.lit('"}, "source": {"ts_ms": '),
        ts,
        F.lit(', "db": "d", "schema": "s", "table": "t"}, "op": "c",'
              ' "ts_ms": '),
        ts,
        F.lit("}}"),
    )
    return (
        src.select(envelope.alias("value"))
        .withColumn("topic", F.lit(None).cast("string"))
        .withColumn("partition", F.lit(None).cast("int"))
        .withColumn("offset", F.lit(None).cast("long"))
    ), rows_per_batch


def run_rate(spark, payload, rate: int) -> dict:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.streaming.changelog_stream import (
        StreamConfig,
        start_changelog_stream,
    )

    work = Path(tempfile.mkdtemp(prefix=f"kneejvm_{rate}_"))
    raw, rows_per_batch = jvm_envelope_source(spark, rate)
    cfg = StreamConfig(
        pipeline_id=f"kneejvm-{rate}",
        target_path=str(work / "target"),
        event_log_path=str(work / "event_log"),
        checkpoint_dir=str(work / "ckpt"),
        trigger={"processingTime": f"{TRIGGER_MS} milliseconds"},
    )
    q = start_changelog_stream(spark, raw, payload, cfg)
    t0 = time.time()
    deadline = t0 + SECS
    while time.time() < deadline:
        time.sleep(0.25)
    elapsed = time.time() - t0
    # recentProgress holds the full trailing window (far more than this
    # sweep produces) — no polling race on the last batch
    seen: dict[int, dict] = {}
    for p in q.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(str(p))
        if p.get("batchId") is not None and p.get("numInputRows", 0) > 0:
            seen[p["batchId"]] = p
    progresses = [seen[k] for k in sorted(seen)]

    def visible_rows() -> int:
        try:
            row = (
                spark.read.parquet(cfg.target_path)
                .agg(F.count(F.lit(1)).alias("n"))
                .first()
            )
            return int(row["n"] or 0)
        except Exception:
            return 0

    vis = visible_rows()
    vis_t = time.time() - t0
    q.stop()
    committed = sum(int(p.get("numInputRows", 0)) for p in progresses)

    def dur(component: str) -> dict | None:
        vals = [
            p["durationMs"][component]
            for p in progresses
            if component in p.get("durationMs", {})
        ]
        if not vals:
            return None
        return {
            "mean_ms": round(statistics.mean(vals), 1),
            "max_ms": max(vals),
        }

    achieved = committed / elapsed
    out = {
        "rate_eps": rate,
        "rows_per_batch": rows_per_batch,
        "duration_s": round(elapsed, 1),
        "batches": len(progresses),
        "achieved_eps": int(achieved),
        "visible_rows": vis,
        "visible_eps": int(vis / vis_t),
        "keeping_up": achieved >= 0.9 * rate,
        "stages": {
            "addBatch": dur("addBatch"),
            "latestOffset": dur("latestOffset"),
            "walCommit": dur("walCommit"),
            "commitOffsets": dur("commitOffsets"),
            "queryPlanning": dur("queryPlanning"),
        },
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from cdc_application_febuary_spark.session import get_spark

    payload = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    spark = get_spark(app_name="stream-knee-jvm")
    spark.sparkContext.setLogLevel("ERROR")

    sweep = []
    for rate in RATES:
        r = run_rate(spark, payload, rate)
        sweep.append(r)
        print(json.dumps(r), flush=True)

    knee = next((r for r in sweep if not r["keeping_up"]), None)
    best = max(sweep, key=lambda r: r["achieved_eps"])
    line = {
        "metric": "engine-side knee (JVM rate-micro-batch feed)",
        "first_tier_not_keeping_up_eps": knee["rate_eps"] if knee else None,
        "max_sustained_eps": best["achieved_eps"],
        "max_sustained_at_rows_per_batch": best["rows_per_batch"],
        "sweep": sweep,
    }
    print(json.dumps(line))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd:
        out = Path(__file__).resolve().parent.parent / (
            f"STREAMKNEE_r{int(rnd):02d}.json"
        )
        out.write_text(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
