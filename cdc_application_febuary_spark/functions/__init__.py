"""Scalar expression helpers (column-level, JVM-side — no Python UDFs)."""
