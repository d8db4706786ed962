"""File/object-store sources (reference S3 connector,
`backend/ingestion/connectors/s3.py`): objects-as-tables listing, JSON /
CSV / text readers, and value-based schema inference.

The reference GETs whole objects into Python and slices lists for
pagination (`s3.py:366-463`); Spark's path-glob readers are the distributed
replacement (`spark.read.json/csv/text("s3a://bucket/prefix/...")`) — the
same code paths work on local paths in tests and s3a:// in production.

Schema inference (`s3.py:635-776` `_infer_type`) maps to Spark's built-in
sampling inference plus `infer_value_type` for the value-level rule parity.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ObjectInfo:
    """Listing entry (reference `_list_objects`, s3.py:567-633)."""

    key: str
    size: int
    table: str  # derived table name (last path segment sans extension)


def list_objects(root: str, suffixes: tuple[str, ...] = (".json", ".csv", ".txt")) -> list[ObjectInfo]:
    """Objects-as-tables listing over a filesystem root (s3a:// at scale via
    Hadoop FS; local paths here). Table name = stem of the object key."""
    out = []
    for p in sorted(Path(root).rglob("*")):
        if p.is_file() and p.suffix in suffixes:
            out.append(
                ObjectInfo(
                    key=str(p.relative_to(root)),
                    size=p.stat().st_size,
                    table=p.stem,
                )
            )
    return out


def infer_value_type(value) -> str:
    """Value-based type inference, matching the reference's rules
    (s3.py:752-776): bool before int (bool is an int subtype in Python),
    dict -> json, list -> array."""
    if value is None:
        return "string"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "float"
    if isinstance(value, dict):
        return "json"
    if isinstance(value, list):
        return "array"
    return "string"


def infer_json_schema(sample_lines: list[str]) -> dict[str, str]:
    """Merge value-inferred types across sampled records; conflicting types
    widen to string (the reference keeps first-seen, which silently
    mis-types mixed columns — widening is the safe version)."""
    merged: dict[str, str] = {}
    for line in sample_lines:
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not isinstance(rec, dict):
            continue
        for k, v in rec.items():
            t = infer_value_type(v)
            if k in merged and merged[k] != t:
                # integer+float widen to float, anything else to string
                if {merged[k], t} == {"integer", "float"}:
                    merged[k] = "float"
                else:
                    merged[k] = "string"
            else:
                merged.setdefault(k, t)
    return merged


def read_json_objects(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines (or array-of-objects via multiLine) reader with sampled
    schema inference — the distributed form of the reference's
    parse-in-Python path (s3.py:366-430)."""
    return spark.read.option("multiLine", "false").json(path)


def read_csv_objects(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """CSV reader with header + type inference (reference uses DictReader,
    all-string; inferSchema recovers numeric columns)."""
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Plain text-lines reader (reference text fallback, s3.py:447-455)."""
    return spark.read.text(path)


def write_full_load_json(df: DataFrame, path: str) -> None:
    """S3 full-load sink. The reference accumulates the whole table in
    driver memory and writes ONE object (`cdc_manager.py:1612-1777`) — at
    scale that's the bug, not the feature: this writes partitioned JSON
    parts concurrently."""
    df.write.mode("append").json(path)
