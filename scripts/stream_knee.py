#!/usr/bin/env python
"""Sustained-streaming saturation knee (VERDICT r5 item 3).

Round 5 showed 10k ev/s holds p99 2.2 s. The reference's lag thresholds
(warn < 60 s, critical >= 300 s — lag_monitor.py:83) pose a capacity
question: at what sustained rate does the pipeline stop keeping up?
This drill steps the rate (10k / 20k / 50k / 100k ev/s x 60 s each,
one feed file per 500 ms tick through the changelog->SCD2 stream) until
ticks go non-visible within the drain window or p99 crosses 60 s, and
reports, per rate:

  * per-tick time-to-visibility p50/p99/max + ticks visible;
  * end-of-feed backlog (events fed but not yet visible) and drain time;
  * checkpoint / target growth;
  * STAGE ATTRIBUTION from StreamingQueryProgress.durationMs — mean and
    max of addBatch (the actual micro-batch work: SCD2 merge + parquet
    commit), latestOffset (file-source listing), walCommit+commitOffsets
    (checkpoint bookkeeping) — naming which stage eats the budget as the
    rate climbs.

Emits one JSON line; also STREAMKNEE_r{N}.json when SPARK_GRAFT_ROUND is
set. Run alone (bench discipline).
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

from scripts.streaming_bench import _dir_mb, envelope  # noqa: E402

RATES = [
    int(r)
    for r in os.environ.get(
        "SPARK_GRAFT_KNEE_RATES", "10000,20000,50000,100000"
    ).split(",")
]
SECS = int(os.environ.get("SPARK_GRAFT_KNEE_SECS", "60"))
TICK_S = 0.5
DRAIN_TIMEOUT_S = 120
P99_STOP_S = 60.0


def run_rate(spark, payload, rate: int) -> dict:
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.streaming.changelog_stream import (
        StreamConfig,
        file_source,
        start_changelog_stream,
    )

    per_tick = max(1, int(rate * TICK_S))
    n_ticks = int(SECS / TICK_S)
    work = Path(tempfile.mkdtemp(prefix=f"knee_{rate}_"))
    feed = work / "feed"
    feed.mkdir()
    (feed / "warm.json").write_text(envelope(-1, 0) + "\n")
    cfg = StreamConfig(
        pipeline_id=f"knee-{rate}",
        target_path=str(work / "target"),
        event_log_path=str(work / "event_log"),
        checkpoint_dir=str(work / "ckpt"),
        trigger={"processingTime": "500 milliseconds"},
    )
    q = start_changelog_stream(
        spark, file_source(spark, str(feed)), payload, cfg
    )
    deadline = time.time() + 60
    while time.time() < deadline:  # warm row visible
        try:
            if spark.read.parquet(cfg.target_path).count() >= 1:
                break
        except Exception:
            pass
        time.sleep(0.2)

    def max_visible_id() -> int:
        try:
            row = spark.read.parquet(cfg.target_path).agg(F.max("id")).first()
            return row[0] if row[0] is not None else -1
        except Exception:
            return -1

    write_ts: list[float] = []
    seen_ts: dict[int, float] = {}
    progresses: list[dict] = []
    seen_batch_ids: set = set()

    def poll() -> None:
        mid = max_visible_id()
        now = time.time()
        for k in range(len(write_ts)):
            if k not in seen_ts and mid >= (k + 1) * per_tick - 1:
                seen_ts[k] = now
        p = q.lastProgress
        if p and p.get("batchId") not in seen_batch_ids:
            seen_batch_ids.add(p.get("batchId"))
            progresses.append(p)

    t_start = time.time()
    for k in range(n_ticks):
        target_t = t_start + k * TICK_S
        while time.time() < target_t:
            time.sleep(0.02)
        ts_ms = int(time.time() * 1000)
        body = "\n".join(
            envelope(k * per_tick + i, ts_ms) for i in range(per_tick)
        ) + "\n"
        (feed / f"tick-{k:05d}.json").write_text(body)
        write_ts.append(time.time())
        poll()
    feed_end = time.time()
    # feeder honesty: at very high rates the Python envelope generator
    # itself can slip past the 500 ms tick budget — report the EFFECTIVE
    # rate so a feeder-bound tier is visible as such
    effective_eps = (
        n_ticks * per_tick / max(feed_end - t_start, 1e-9)
    )
    backlog_at_feed_end = n_ticks * per_tick - (max_visible_id() + 1)
    deadline = time.time() + DRAIN_TIMEOUT_S
    while len(seen_ts) < n_ticks and time.time() < deadline:
        time.sleep(0.25)
        poll()
    drain_s = time.time() - feed_end
    q.stop()

    lat = sorted(
        seen_ts[k] - write_ts[k] for k in range(n_ticks) if k in seen_ts
    )

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

    out = {
        "rate_eps": rate,
        "effective_eps": int(effective_eps),
        "duration_s": SECS,
        "ticks": n_ticks,
        "ticks_visible": len(lat),
        "p50_s": round(lat[len(lat) // 2], 3) if lat else None,
        "p99_s": round(lat[int(len(lat) * 0.99)], 3) if lat else None,
        "max_s": round(lat[-1], 3) if lat else None,
        "backlog_rows_at_feed_end": int(max(0, backlog_at_feed_end)),
        "drain_s": round(drain_s, 1),
        "checkpoint_mb": _dir_mb(str(work / "ckpt")),
        "target_mb": _dir_mb(str(work / "target")),
        "stages": {
            "addBatch": dur("addBatch"),
            "latestOffset": dur("latestOffset"),
            "walCommit": dur("walCommit"),
            "commitOffsets": dur("commitOffsets"),
            "queryPlanning": dur("queryPlanning"),
        },
        "batches_observed": len(progresses),
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
    spark = get_spark(app_name="stream-knee")
    spark.sparkContext.setLogLevel("ERROR")

    sweep = []
    for rate in RATES:
        r = run_rate(spark, payload, rate)
        sweep.append(r)
        print(json.dumps(r), flush=True)
        if r["ticks_visible"] < r["ticks"] or (
            r["p99_s"] is not None and r["p99_s"] > P99_STOP_S
        ):
            break

    line = {"metric": "sustained rate sweep to saturation", "sweep": sweep}
    print(json.dumps(line))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd:
        out = Path(__file__).resolve().parent.parent / (
            f"STREAMKNEE_r{int(rnd):02d}.json"
        )
        out.write_text(json.dumps(line, indent=1))


if __name__ == "__main__":
    main()
