#!/usr/bin/env python
"""Generate literal-VALUES DuckDB oracles for the in-process multimodal
queries (VERDICT r6 item 1c: payloads are generated deterministically
in-process and never read the fixtures, so the expected output rows can
be stated OUTRIGHT in the oracle — any codec/resize/probe regression then
hash-fails the driver gate at every scale factor).

Run after changing a codec or a multimodal query; paste the printed SQL
into the matching @_q oracle in queries/pipeline_ops.py. The script runs
each query TWICE (different partitioning) and refuses to print an oracle
whose rows are not bit-stable.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "multimodal_features",
    "multimodal_decode",
    "audio_decode",
    "multimodal_thumbnails",
    "video_probe",
    "video_frame_index",
]

_DUCK_TYPE = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main() -> int:
    from pyspark.sql import SparkSession

    from cdc_application_febuary_spark.queries import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("gen-literal-oracles")
        .getOrCreate()
    )
    qs = all_queries()
    sf = "/root/testdata/sf0.01"
    names = sys.argv[1:] or QUERIES
    for name in names:
        df = qs[name](spark, sf)
        fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        bad = [f"{n}:{t}" for n, t in fields if t not in _DUCK_TYPE]
        if bad:
            print(f"-- {name}: REFUSING, non-literal-safe columns {bad}")
            continue
        def _key(row):
            return tuple((v is None, str(v)) for v in row)

        rows1 = sorted((tuple(r) for r in df.collect()), key=_key)
        # stability probe: a second run (the generators are rebuilt from
        # scratch per call) must reproduce the rows bit-for-bit
        rows2 = sorted(
            (tuple(r) for r in qs[name](spark, sf).collect()), key=_key
        )
        if rows1 != rows2:
            print(f"-- {name}: REFUSING, rows not run-stable")
            continue
        cols = ", ".join(n for n, _ in fields)
        casts = ",\n       ".join(
            f"CAST({n} AS {_DUCK_TYPE[t]}) AS {n}" for n, t in fields
        )
        vals = ",\n  ".join(
            "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows1
        )
        print(f"-- ===== {name} ({len(rows1)} rows) =====")
        print(
            f"SELECT {casts}\nFROM (VALUES\n  {vals}\n) AS t({cols})\n"
            f"ORDER BY {cols}"
        )
        print()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
