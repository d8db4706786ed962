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
