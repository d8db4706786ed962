#!/usr/bin/env python
"""Streaming time-to-visibility harness, mirroring the reference's
`backend/scripts/insert_and_measure_cdc_latency.py` (insert N rows, poll the
target, report seconds-to-visibility; N in {100, 1000, 10000}).

Here: write an N-event Debezium-envelope burst into a file feed, run the
continuously-triggered changelog stream, poll the SCD2 target parquet every
0.5 s until all N rows are visible. Prints one JSON line per N.

Sustained mode (VERDICT r4 item 7, mirroring the reference's steady-state
`backend/lag_report.json` snapshot): hold SPARK_GRAFT_STREAM_RATE events/s
(default 2000) for SPARK_GRAFT_STREAM_SECS seconds (default 30) as one feed
file per 500 ms tick, track per-tick time-to-visibility (file landing ->
every row of that tick readable in the target), and report p50/p99/max
visibility plus checkpoint and target growth. Both modes print into ONE
JSON line (and STREAMBENCH_r{N}.json when SPARK_GRAFT_ROUND is set).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def envelope(i: int, ts_ms: int) -> str:
    return json.dumps(
        {
            "payload": {
                "before": None,
                "after": {"id": i, "name": f"row-{i}"},
                "source": {"ts_ms": ts_ms, "db": "d", "schema": "s", "table": "t"},
                "op": "c",
                "ts_ms": ts_ms,
            }
        }
    )


def _dir_mb(path: str) -> float:
    total = 0
    for p in Path(path).rglob("*"):
        if p.is_file():
            total += p.stat().st_size
    return round(total / 1e6, 2)


def run_sustained(spark, payload) -> dict:
    """Hold RATE events/s for SECS seconds (one feed file per 500 ms tick),
    measure per-tick time-to-visibility, report p50/p99/max + growth."""
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.streaming.changelog_stream import (
        StreamConfig,
        file_source,
        start_changelog_stream,
    )

    rate = int(os.environ.get("SPARK_GRAFT_STREAM_RATE", "2000"))
    secs = int(os.environ.get("SPARK_GRAFT_STREAM_SECS", "30"))
    tick_s = 0.5
    per_tick = max(1, int(rate * tick_s))
    n_ticks = int(secs / tick_s)

    work = Path(tempfile.mkdtemp(prefix="stream_sustained_"))
    feed = work / "feed"
    feed.mkdir()
    (feed / "warm.json").write_text(envelope(-1, 0) + "\n")
    cfg = StreamConfig(
        pipeline_id="sustained",
        target_path=str(work / "target"),
        event_log_path=str(work / "event_log"),
        checkpoint_dir=str(work / "ckpt"),
        trigger={"processingTime": "500 milliseconds"},
    )
    q = start_changelog_stream(
        spark, file_source(spark, str(feed)), payload, cfg
    )
    deadline = time.time() + 60
    while time.time() < deadline:  # wait for the warm row
        try:
            if spark.read.parquet(cfg.target_path).count() >= 1:
                break
        except Exception:
            pass
        time.sleep(0.2)

    def max_visible_id() -> int:
        try:
            row = (
                spark.read.parquet(cfg.target_path)
                .agg(F.max("id"))
                .first()
            )
            return row[0] if row[0] is not None else -1
        except Exception:
            return -1

    write_ts: list[float] = []
    seen_ts: dict[int, float] = {}  # tick -> first time its last id visible

    def poll() -> None:
        mid = max_visible_id()
        now = time.time()
        for k in range(len(write_ts)):
            if k not in seen_ts and mid >= (k + 1) * per_tick - 1:
                seen_ts[k] = now

    t_start = time.time()
    for k in range(n_ticks):
        target_t = t_start + k * tick_s
        while time.time() < target_t:
            time.sleep(0.02)
        ts_ms = int(time.time() * 1000)
        body = "\n".join(
            envelope(k * per_tick + i, ts_ms) for i in range(per_tick)
        ) + "\n"
        (feed / f"tick-{k:05d}.json").write_text(body)
        write_ts.append(time.time())
        poll()
    # drain: poll until every tick is visible (or timeout)
    deadline = time.time() + 120
    while len(seen_ts) < n_ticks and time.time() < deadline:
        time.sleep(0.25)
        poll()
    q.stop()

    lat = sorted(
        seen_ts[k] - write_ts[k] for k in range(n_ticks) if k in seen_ts
    )

    # VALUE CHECK (VERDICT r5 item 6): the replay lifecycles prove
    # "replay exact"; this proves "LIVE-RATE exact" — after the sustained
    # run, the SCD2 target must equal a batch recompute of the very feed
    # files the run wrote. Pure inserts with distinct ids => current
    # state == every (id, name) fed. Compared via count + a commutative
    # per-row hash sum (order-independent, no sort; summed in
    # DECIMAL(38,0) because a long sum of 64-bit hashes overflows ANSI).
    def idname_fingerprint(df) -> tuple[int, int]:
        # xxhash64 is input-TYPE-sensitive (int32 vs int64 hash apart):
        # normalize id to long on both sides before hashing.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(
                    F.xxhash64(
                        F.col("id").cast("long"), F.col("name")
                    ).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    fed = (
        spark.read.text(str(feed))
        .select(F.get_json_object("value", "$.payload.after.id")
                .cast("long").alias("id"),
                F.get_json_object("value", "$.payload.after.name")
                .alias("name"))
        .where(F.col("id").isNotNull())
    )
    exp_n, exp_h = idname_fingerprint(fed)
    got_n, got_h = idname_fingerprint(
        spark.read.parquet(cfg.target_path).select("id", "name")
    )
    out = {
        "rate_eps": rate,
        "duration_s": secs,
        "ticks": n_ticks,
        "ticks_visible": len(lat),
        "p50_s": round(lat[len(lat) // 2], 3) if lat else None,
        "p99_s": round(lat[int(len(lat) * 0.99)], 3) if lat else None,
        "max_s": round(lat[-1], 3) if lat else None,
        "checkpoint_mb": _dir_mb(str(work / "ckpt")),
        "target_mb": _dir_mb(str(work / "target")),
        "value_check": {
            "rows_match": got_n == exp_n,
            "hash_match": got_h == exp_h,
            "rows": got_n,
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
    from cdc_application_febuary_spark.streaming.changelog_stream import (
        StreamConfig,
        file_source,
        start_changelog_stream,
    )

    payload = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    spark = get_spark(app_name="cdc-streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in (100, 1000, 10000):
        work = Path(tempfile.mkdtemp(prefix=f"stream_bench_{n}_"))
        feed = work / "feed"
        feed.mkdir()
        # warm the stream with one row so JVM/stream startup isn't billed
        (feed / "warm.json").write_text(envelope(-1, 0) + "\n")
        cfg = StreamConfig(
            pipeline_id=f"bench-{n}",
            target_path=str(work / "target"),
            event_log_path=str(work / "event_log"),
            checkpoint_dir=str(work / "ckpt"),
            trigger={"processingTime": "500 milliseconds"},
        )
        q = start_changelog_stream(
            spark, file_source(spark, str(feed)), payload, cfg
        )
        # wait for warm row
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(cfg.target_path).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.2)

        now_ms = int(time.time() * 1000)
        burst = "\n".join(envelope(i, now_ms) for i in range(n)) + "\n"
        t0 = time.time()
        (feed / "burst.json").write_text(burst)
        visible = None
        deadline = time.time() + 120  # reference timeout (120 s)
        while time.time() < deadline:
            try:
                cnt = spark.read.parquet(cfg.target_path).count()
                if cnt >= n + 1:
                    visible = round(time.time() - t0, 3)
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        results[str(n)] = visible if visible is not None else "timeout"
        shutil.rmtree(work, ignore_errors=True)

    sustained = run_sustained(spark, payload)

    line = {
        "metric": "burst + sustained time-to-visibility (file feed -> SCD2 target)",
        "unit": "sec",
        "bursts": results,
        "sustained": sustained,
    }
    print(json.dumps(line))
    # Round-over-round regression visibility (VERDICT r3 item 6): persist
    # next to BENCH_r{N}.json when the round number is known.
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd:
        out = Path(__file__).resolve().parent.parent / (
            f"STREAMBENCH_r{int(rnd):02d}.json"
        )
        out.write_text(json.dumps(line, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
