"""Best-effort `google.protobuf` availability for transformWithState.

Spark 4's transformWithStateInPandas rides a protobuf protocol between the
Python worker and the JVM state server; the generated
``pyspark/sql/streaming/proto/StateMessage_pb2.py`` imports
``google.protobuf`` unconditionally. This container has no protobuf
install, but the machine's google-cloud-sdk ships the public pure-Python
4.23 runtime. ``ensure_protobuf()`` bridges it in via the repo's
``vendor/pbcompat`` shim package (path-extension + a ``runtime_version``
stub) — and, critically, exports the same paths through ``PYTHONPATH`` so
Spark's *Python workers* (separate processes that re-import the proto
modules) resolve it too.

Call ``ensure_protobuf()`` BEFORE creating the SparkSession whose workers
need it: PythonRunner snapshots the driver's PYTHONPATH when the context
launches worker daemons.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_SDK_ROOT = "/usr/lib/google-cloud-sdk/lib/third_party"
_VENDOR = str(Path(__file__).resolve().parents[2] / "vendor" / "pbcompat")


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True when protobuf (real or bridged) is usable; False when
    neither a real install nor the SDK runtime exists. Never raises."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not (
        os.path.isdir(os.path.join(_SDK_ROOT, "cloudsdk/google/protobuf"))
        and os.path.isdir(os.path.join(_VENDOR, "google/protobuf"))
    ):
        return False
    for p in (_VENDOR, _SDK_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    extra = os.pathsep.join((_VENDOR, _SDK_ROOT))
    current = os.environ.get("PYTHONPATH", "")
    if _VENDOR not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{extra}{os.pathsep}{current}" if current else extra
        )
    # drop any half-imported namespace remnants so the shim wins
    for mod in ("google", "google.protobuf"):
        existing = sys.modules.get(mod)
        if existing is not None and not getattr(existing, "__file__", None):
            del sys.modules[mod]
    try:
        import google.protobuf  # noqa: F401
        from google.protobuf import runtime_version  # noqa: F401

        return True
    except ImportError:
        return False
