"""Custom stateful streaming operators via applyInPandasWithState —
the extension point for semantics micro-batch joins can't express
(running per-key aggregates that survive across batches, in-stream dedup).

The reference holds no in-flight state (T8: all state = target DB rows);
these operators are part of the beyond-reference surface. State lives in
the state store (checkpointed, partitioned by key) — memory per executor
is bounded by keys-per-partition, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_COUNT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("events", LongType()),
        StructField("batch_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("events", LongType())])


def running_counts(
    grouped, timeout: str = "NoTimeout"
) -> DataFrame:
    """Per-key running event counts across micro-batches.

    `grouped` is `stream.groupBy(key_col)`; emits (key, events, batch_events)
    once per key per micro-batch with the all-time total."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            {"key": [str(key[0])], "events": [total], "batch_events": [batch]}
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


SEEN_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("fresh", LongType()),
        StructField("duplicates", LongType()),
    ]
)

_SEEN_STATE = StructType([StructField("seen_ids", StringType())])


def stream_dedup_counts(grouped) -> DataFrame:
    """In-stream exact dedup per key: counts fresh vs already-seen event ids
    across the stream's lifetime (id set kept in state as a CSV string —
    for production keys with large id sets you'd hold a Bloom filter
    instead; the operator shape is identical)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[str] = set()
        if state.exists and state.get[0]:
            seen = set(state.get[0].split(","))
        fresh = dup = 0
        for p in pdfs:
            for v in p["event_id"].astype(str):
                if v in seen:
                    dup += 1
                else:
                    seen.add(v)
                    fresh += 1
        state.update((",".join(sorted(seen)),))
        yield pd.DataFrame(
            {"key": [str(key[0])], "fresh": [fresh], "duplicates": [dup]}
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=SEEN_SCHEMA,
        stateStructType=_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
