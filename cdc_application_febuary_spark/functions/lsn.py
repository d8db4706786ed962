"""LSN / offset arithmetic as column expressions.

The reference parses PostgreSQL WAL LSNs (``X/Y`` hex) into int64 in Python
(`backend/ingestion/connectors/postgresql.py:657-669`, duplicated at
`backend/ingestion/api.py:8595-8615`) and computes lag gaps
(`api.py:8587-8619`). Here they are pure Spark expressions so lag math runs
distributed over the metrics table, not row-at-a-time on a driver.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def pg_lsn_to_long(lsn: Column | str) -> Column:
    """``'16/B374D848'`` -> ``(0x16 << 32) | 0xB374D848`` as a long."""
    c = F.col(lsn) if isinstance(lsn, str) else lsn
    hi = F.conv(F.split(c, "/").getItem(0), 16, 10).cast("long")
    lo = F.conv(F.split(c, "/").getItem(1), 16, 10).cast("long")
    return (F.shiftleft(hi, 32) + lo).alias("lsn_long")


def long_to_pg_lsn(v: Column | str) -> Column:
    """Inverse of :func:`pg_lsn_to_long` (upper-case hex, no padding)."""
    c = F.col(v) if isinstance(v, str) else v
    hi = F.upper(F.hex(F.shiftrightunsigned(c, 32)))
    lo = F.upper(F.hex(c.bitwiseAND(F.lit(0xFFFFFFFF))))
    return F.concat_ws("/", hi, lo)


def lsn_gap_bytes(source_lsn: Column, processed_lsn: Column) -> Column:
    """``max(0, source - processed)`` in bytes (reference api.py:8606-8612)."""
    gap = pg_lsn_to_long(source_lsn) - pg_lsn_to_long(processed_lsn)
    return F.greatest(gap, F.lit(0).cast("long"))


def lsn_gap_mb(source_lsn: Column, processed_lsn: Column) -> Column:
    return (lsn_gap_bytes(source_lsn, processed_lsn) / F.lit(1024.0 * 1024.0)).alias(
        "gap_mb"
    )


def sqlserver_lsn_to_long(lsn: Column | str) -> Column:
    """SQL Server LSN ``file:slot:op`` hex triple -> orderable long
    (reference format: `connectors/sqlserver.py:2521-2677`). The three parts
    are 4/4/2 bytes; pack as (file<<48)|(slot<<16)|op."""
    c = F.col(lsn) if isinstance(lsn, str) else lsn
    part = lambda i: F.conv(F.split(c, ":").getItem(i), 16, 10).cast("long")
    return F.shiftleft(part(0), 48) + F.shiftleft(part(1), 16) + part(2)
