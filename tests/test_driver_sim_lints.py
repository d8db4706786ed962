"""The driver-sim oracle output-type lints (DECIMAL + HUGEINT).

VERDICT r2: tpch_q12's uncast `SUM(CASE ...)` produced DuckDB HUGEINT, which
the round driver renders as float64 ("354.0") against Spark's bigint ("354")
— a hash mismatch the local sim's fetchall() path structurally cannot catch
by value comparison. The lint must fail any oracle emitting HUGEINT or
DECIMAL before it reaches a round driver.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from driver_sim import oracle_type_lints  # noqa: E402


def _lints(sql: str) -> list[str]:
    rel = duckdb.connect().sql(sql)
    return oracle_type_lints(rel.columns, rel.types)


def test_uncast_sum_int_is_hugeint_and_flagged():
    flagged = _lints("SELECT SUM(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS n FROM (VALUES (1), (2)) t(x)")
    assert flagged == ["n:HUGEINT"]


def test_decimal_output_flagged():
    flagged = _lints("SELECT CAST(1.5 AS DECIMAL(18,2)) AS d")
    assert len(flagged) == 1 and flagged[0].startswith("d:DECIMAL")


def test_cast_bigint_and_double_clean():
    assert (
        _lints(
            "SELECT CAST(SUM(x) AS BIGINT) AS n, CAST(AVG(x) AS DOUBLE) AS a "
            "FROM (VALUES (1), (2)) t(x)"
        )
        == []
    )


def test_every_registered_oracle_passes_the_lint():
    """Static sweep: no registered oracle may emit DECIMAL/HUGEINT columns.

    Runs each oracle against empty-but-typed views so output *types* (the
    lint's subject) are computed without needing the fixture data.
    """
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        flagged = oracle_type_lints(rel.columns, rel.types)
        if flagged:
            offenders[name] = flagged
    assert offenders == {}
