"""Identifier/topic/name scalar helpers (reference F5/F6/P6/F8/F10)."""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# --- F5: identifier sanitization (debezium_config.py:139-143, 736-745) -----
_SANITIZE_RE = r"[#@$%^&*()+=\[\]{};:'\",.<>?/\\|`~ -]"


def sanitize_identifier(name: Column | str) -> Column:
    """Strip special characters, collapse runs of underscores."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_replace(F.regexp_replace(c, _SANITIZE_RE, "_"), "_+", "_")


def sanitize_identifier_py(name: str) -> str:
    """Driver-side twin for config generation."""
    return re.sub("_+", "_", re.sub(_SANITIZE_RE, "_", name))


# --- F6: topic-name build (debezium_config.py:747-775) ----------------------
def topic_name(*parts: Column | str) -> Column:
    """``{pipeline}.{schema}.{table}`` (SQL Server adds the db part —
    pass 4 components)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws(".", *cols)


# --- P6: topic -> table extraction (sink_config.py:644-658) -----------------
def table_from_topic(topic: Column | str) -> Column:
    """Last dot-separated segment of the topic name."""
    c = F.col(topic) if isinstance(topic, str) else topic
    return F.element_at(F.split(c, r"\."), -1)


# --- F10: status normalization (api.py:9036-9049) ---------------------------
def normalize_status(status: Column | str) -> Column:
    c = F.lower(F.col(status) if isinstance(status, str) else status)
    return (
        F.when(c.isin("completed", "applied", "success", "succeeded"), "success")
        .when(c.isin("failed", "error", "errored"), "failed")
        .when(c.isin("running", "in_progress", "pending"), "pending")
        .otherwise("unknown")
    )


# --- F8: default-value translation (transfer.py:551-595, 681-707) ----------
_DEFAULT_MAP = [
    (re.compile(r"getdate\(\)", re.I), "CURRENT_TIMESTAMP"),
    (re.compile(r"sysdatetime\(\)", re.I), "CURRENT_TIMESTAMP"),
    (re.compile(r"newid\(\)", re.I), "gen_random_uuid()"),
    (re.compile(r"newsequentialid\(\)", re.I), "gen_random_uuid()"),
]


def translate_default(value: str | None) -> str | None:
    """SQL Server default expression -> PostgreSQL form: GETDATE() ->
    CURRENT_TIMESTAMP, NEWID() -> gen_random_uuid(), strip `::type` casts
    and `((0))` wrapping (0/1 bit defaults -> false/true)."""
    if value is None:
        return None
    v = value.strip()
    # strip nested parens
    while v.startswith("(") and v.endswith(")"):
        v = v[1:-1].strip()
    for rx, repl in _DEFAULT_MAP:
        v = rx.sub(repl, v)
    v = re.sub(r"::[a-zA-Z_ ]+", "", v)  # '0'::smallint -> '0'
    if v in ("0", "1"):
        return "false" if v == "0" else "true"
    return v
