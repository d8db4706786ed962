"""DuckDB-oracle comparison harness mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison, with strict
canonicalization (no float tolerance — the queries are engineered so results
are exact across engines)."""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{repr(v)}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(_canon(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(columns, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    try:
        rel = con.sql(oracle_sql)
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
    finally:
        con.close()
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    _, s_rows = canon_rows(spark_cols, spark_rows)
    _, d_rows = canon_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
