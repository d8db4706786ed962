"""Stateful streaming on the Spark 4 transformWithStateInPandas API —
the successor to applyInPandasWithState (streaming/stateful.py keeps the
classic form). Differences that matter at scale: typed state variables
(ValueState/ListState/MapState) instead of one tuple, per-state TTL so
idle keys expire without a custom timeout dance, and timer callbacks.

Requires the RocksDB state store provider (the HDFS-backed default does
not support transformWithState); callers flip the conf via
``use_rocksdb_state``. The Python<->JVM state protocol additionally
needs ``google.protobuf`` at runtime — ``compat.protobuf_compat``
bridges the machine's public pure-Python runtime where no real install
exists (importing this module arranges it, BEFORE the SparkSession is
created so workers inherit the path); if no runtime can be found at
all, use the applyInPandasWithState operators in ``stateful.py`` (same
semantics, tuple-typed state).
"""

from __future__ import annotations

from ..compat.protobuf_compat import ensure_protobuf

ensure_protobuf()

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("events", LongType()),
        StructField("batch_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("events", LongType())])


def use_rocksdb_state(spark: SparkSession) -> None:
    """transformWithState requires RocksDB-backed state."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


class _WorkerProtobufBridge:
    """Repair ``google.protobuf`` inside the state-protocol WORKER.

    The transformWithState worker may have cached ``google`` /
    ``google.protobuf`` as the empty namespace packages that live inside
    spark-core.jar (sys.path includes the jar) before any bridge path is
    visible — after which the proto import dies with "cannot import name
    'descriptor' ... (unknown location)". Deserializing the processor is
    the first engine-controlled code to run in that worker, BEFORE
    ``_handle_pre_init`` imports StateMessage_pb2 — so ``__setstate__``
    injects the bridge paths (captured driver-side in ``_pb_paths``) and
    purges the poisoned namespace modules. No-op when a real protobuf is
    installed (modules then have ``__file__``)."""

    def __getstate__(self):
        from ..compat import protobuf_compat as pc

        state = dict(self.__dict__)
        state["_pb_paths"] = (pc._VENDOR, pc._SDK_ROOT)
        return state

    def __setstate__(self, state):
        import sys

        self.__dict__.update(state)
        for p in state.get("_pb_paths", ()):
            if p and p not in sys.path:
                sys.path.insert(0, p)
        for mod in ("google", "google.protobuf"):
            m = sys.modules.get(mod)
            if m is not None and not getattr(m, "__file__", None):
                del sys.modules[mod]


class RunningCountProcessor(_WorkerProtobufBridge, StatefulProcessor):
    """Per-key running totals in a typed ValueState — the
    transformWithState twin of ``stateful.running_counts``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("events", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = sum(len(p) for p in rows)
        prev = self._count.get()
        total = (prev[0] if prev is not None else 0) + batch
        self._count.update((total,))
        yield pd.DataFrame(
            {"key": [str(key[0])], "events": [total], "batch_events": [batch]}
        )

    def close(self) -> None:
        pass


def running_counts_tws(grouped) -> DataFrame:
    """`grouped` is `stream.groupBy(key_col)`; emits (key, events,
    batch_events) per key per micro-batch with the all-time total."""
    return grouped.transformWithStateInPandas(
        RunningCountProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


class SessionWindowProcessor(_WorkerProtobufBridge, StatefulProcessor):
    """Event-time session windows with TIMER-driven state eviction — the
    transformWithState capability the classic applyInPandasWithState
    session operator approximates with processing-time timeouts: an idle
    key's open session finalizes (emits + clears state) via an EVENT-TIME
    timer once the watermark proves no in-order event can extend it.

    Correctness does not depend on Spark's input-vs-timer ordering within
    a micro-batch: `handleExpiredTimer` finalizes ONLY when
    ``watermark_ms >= last_event_ms + gap_ms`` (any future event then has
    ``ts > watermark >= last + gap`` and would start a NEW session under
    batch gap-and-island semantics too); a premature fire re-registers
    the timer at the session's current horizon instead. Within one batch,
    all-but-the-last session of a key finalize inline (a future event is
    above the key's batch maximum under event-time-boundary feed splits,
    so only the last session is extendable). State per key is one
    (start, last, n) triple; eviction is the watermark, so state size
    tracks active keys x gap, never stream length.

    The event-time-boundary split discipline (each batch's events for a
    key sort at-or-after the key's stored session start) is enforced at
    runtime: a violating row raises instead of silently corrupting or
    splitting a session (ADVICE r8)."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = int(gap_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("session", _SESSION_STATE_SCHEMA)

    def _emit(self, key, st) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "start_us": [int(st[0])],
                "end_us": [int(st[1])],
                "n_events": [int(st[2])],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        ts = []
        for pdf in rows:
            ts.extend(int(t) for t in pdf["ts_us"])
        ts.sort()
        gap_us = self._gap_ms * 1000
        st = self._sess.get()
        st = (int(st[0]), int(st[1]), int(st[2])) if st is not None else None
        for t in ts:
            if st is None:
                st = (t, t, 1)
            elif t < st[0]:
                # The inline all-but-last finalization and the kept-start
                # merge are only sound under the event-time-boundary feed
                # discipline (each batch's events for a key >= the key's
                # stored start). A violating row would silently corrupt or
                # split sessions — fail loudly instead (ADVICE r8).
                raise RuntimeError(
                    "SessionWindowProcessor: input event at "
                    f"{t}us for key {key!r} precedes the stored session "
                    f"start {st[0]}us — the feed violated the event-time-"
                    "boundary split discipline (see class docstring)"
                )
            elif t - st[1] > gap_us:
                yield self._emit(key, st)
                st = (t, t, 1)
            else:
                st = (st[0], max(st[1], t), st[2] + 1)
        if st is not None:
            self._sess.update(st)
            self._handle.registerTimer(st[1] // 1000 + self._gap_ms)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        st = self._sess.get()
        if st is None:
            return
        st = (int(st[0]), int(st[1]), int(st[2]))
        wm = timerValues.getCurrentWatermarkInMs()
        if wm >= st[1] // 1000 + self._gap_ms:
            self._sess.clear()
            yield self._emit(key, st)
        else:  # extended since this timer was set — wait out the new horizon
            self._handle.registerTimer(st[1] // 1000 + self._gap_ms)

    def close(self) -> None:
        pass


def session_windows_tws(grouped, gap_ms: int) -> DataFrame:
    """`grouped` is `stream.withWatermark(ts, d).groupBy(key)` where rows
    carry ``ts_us`` (epoch-micros long). Emits one row per FINALIZED
    session in append mode; open sessions emit only when their event-time
    timer passes the watermark."""
    return grouped.transformWithStateInPandas(
        SessionWindowProcessor(gap_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
