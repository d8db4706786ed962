"""Incremental polling change source — the engine-native alternative to a
Debezium feed when no WAL reader is available (SURVEY §2.1 S17: "or a JDBC
polling incremental source").

Each poll reads only rows past the captured offset (a monotonically
increasing watermark column: serial key, updated_at, commit ts) and shapes
them as changelog rows (`__op='c'`, source ts). With a JDBC source the
predicate pushes down to the database index; with a lakehouse source it
prunes partitions. Deletes/updates are NOT visible to a pure insert poll —
that's the documented trade against a log-based feed; paired with periodic
reconciliation (operators.quality) it bounds the drift window.

State is a plain dict (offset column + high-water value), serializable into
the pipeline's checkpoint directory like the reference's `full_load_lsn`
handoff (`cdc_manager.py:1578-1589`).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import DataFrame, functions as F


@dataclass
class PollState:
    offset_column: str
    high_water: int | None = None  # epoch-ms or numeric key; None = from start

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "PollState":
        return cls(**json.loads(s))


def save_state(state: PollState, checkpoint_dir: str) -> None:
    p = Path(checkpoint_dir)
    p.mkdir(parents=True, exist_ok=True)
    (p / "poll_state.json").write_text(state.to_json())


def load_state(checkpoint_dir: str, offset_column: str) -> PollState:
    f = Path(checkpoint_dir) / "poll_state.json"
    if f.exists():
        return PollState.from_json(f.read_text())
    return PollState(offset_column=offset_column)


def poll_changes(
    table: DataFrame, state: PollState
) -> tuple[DataFrame, PollState]:
    """One poll: rows with offset strictly above the high-water mark, plus
    the advanced state. The filter is a plain column predicate, so it pushes
    down (JDBC WHERE / parquet stats) — each poll's cost is proportional to
    the *new* data, not the table."""
    col = F.col(state.offset_column)
    changes = table if state.high_water is None else table.where(
        col > F.lit(state.high_water)
    )
    new_high = changes.agg(F.max(col.cast("long"))).collect()[0][0]
    next_state = PollState(
        offset_column=state.offset_column,
        high_water=state.high_water if new_high is None else int(new_high),
    )
    return changes, next_state


def changes_to_changelog(
    changes: DataFrame, ts_ms_col: str | None = None, op: str = "c"
) -> DataFrame:
    """Shape polled rows as change events. ``op='c'`` when polling an
    append-only key (rows only ever appear); ``op='u'`` when polling an
    ``updated_at`` watermark — every polled row is an upsert and the SCD2
    current-state window resolves it against prior versions. ``ts_ms_col``
    supplies the source commit time; otherwise ingestion time is stamped."""
    ts = (
        F.col(ts_ms_col).cast("long")
        if ts_ms_col
        else F.unix_millis(F.current_timestamp())
    )
    return (
        changes.withColumn("__op", F.lit(op))
        .withColumn("__source_ts_ms", ts)
        .withColumn("__deleted", F.lit("false"))
    )
