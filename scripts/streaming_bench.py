#!/usr/bin/env python
"""Streaming time-to-visibility harness, mirroring the reference's
`backend/scripts/insert_and_measure_cdc_latency.py` (insert N rows, poll the
target, report seconds-to-visibility; N in {100, 1000, 10000}).

Here: write an N-event Debezium-envelope burst into a file feed, run the
continuously-triggered changelog stream, poll the SCD2 target parquet every
0.5 s until all N rows are visible. Prints one JSON line per N.
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

    line = {
        "metric": "burst time-to-visibility (file feed -> SCD2 target)",
        "unit": "sec",
        "bursts": results,
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
