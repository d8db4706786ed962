"""Beyond-reference data-pipeline queries (dedup, similarity search, text
analysis, changelog/SCD2 simulation) with DuckDB oracles where the semantics
are SQL-expressible. Populated operator by operator."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
