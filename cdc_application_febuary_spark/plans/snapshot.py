"""Snapshot-mode decision matrix and stream-start planning.

The reference resolves how a pipeline transitions from full load to
streaming per engine (`cdc_manager.py:446-488` + per-engine remaps in
`debezium_config.py`):

  * CDC_ONLY                          -> never snapshot
  * completed full load + captured LSN -> never (stream from the offset)
  * Oracle cannot do `never`          -> initial_only instead
  * SQL Server remaps never           -> schema_only
  * AS400 without an offset           -> initial (full snapshot)
  * otherwise                          -> initial

In the Spark engine "snapshot" is the batch full-load job and "never"
means the streaming query starts at the captured offset; the matrix
becomes a plan decision: (run_full_load?, startingOffsets)."""

from __future__ import annotations

from dataclasses import dataclass

ENGINES = ("postgresql", "sqlserver", "oracle", "db2", "as400", "snowflake", "s3")


@dataclass
class StreamStartPlan:
    engine: str
    snapshot_mode: str          # never | initial | initial_only | schema_only
    run_full_load: bool         # engine-side batch snapshot job
    starting_offsets: str       # kafka startingOffsets value
    reason: str


def resolve_snapshot_mode(
    engine: str,
    mode: str,
    full_load_completed: bool,
    has_captured_offset: bool,
) -> StreamStartPlan:
    """Port of the decision matrix (semantics, not code — see module doc)."""
    engine = engine.lower()
    if engine not in ENGINES:
        raise ValueError(f"unknown engine {engine!r}")

    def plan(snapshot_mode: str, run_fl: bool, offsets: str, reason: str):
        return StreamStartPlan(engine, snapshot_mode, run_fl, offsets, reason)

    if mode == "cdc_only":
        base = plan("never", False, "latest", "cdc_only skips snapshot")
    elif full_load_completed and has_captured_offset:
        base = plan(
            "never", False, "earliest",
            "full load done; stream resumes from captured offset",
        )
    else:
        base = plan("initial", True, "earliest", "fresh pipeline snapshots first")

    # per-engine remaps (debezium_config.py:155-167, 259-263, 379-398, 576-596)
    if base.snapshot_mode == "never":
        if engine == "oracle":
            return plan(
                "initial_only", base.run_full_load, base.starting_offsets,
                "oracle forbids snapshot.mode=never -> initial_only",
            )
        if engine == "sqlserver":
            return plan(
                "schema_only", base.run_full_load, base.starting_offsets,
                "sqlserver remaps never -> schema_only",
            )
        if engine in ("db2", "as400") and not has_captured_offset:
            return plan(
                "initial", True, "earliest",
                "as400 without an offset falls back to a full snapshot",
            )
    return base
