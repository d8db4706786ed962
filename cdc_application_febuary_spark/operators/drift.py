"""Schema drift detection (reference `backend/ingestion/data_quality.py:117-211`):
diff a captured baseline StructType against the currently-observed schema and
classify added / removed / type-modified / nullability-modified columns."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import StructType


@dataclass
class ColumnChange:
    column: str
    kind: str  # added | removed | type_changed | nullability_changed
    before: str | None = None
    after: str | None = None


def diff_schemas(baseline: StructType, observed: StructType) -> list[ColumnChange]:
    b = {f.name: f for f in baseline.fields}
    o = {f.name: f for f in observed.fields}
    changes: list[ColumnChange] = []
    for name in sorted(set(o) - set(b)):
        changes.append(ColumnChange(name, "added", None, o[name].dataType.simpleString()))
    for name in sorted(set(b) - set(o)):
        changes.append(ColumnChange(name, "removed", b[name].dataType.simpleString(), None))
    for name in sorted(set(b) & set(o)):
        bt, ot = b[name].dataType.simpleString(), o[name].dataType.simpleString()
        if bt != ot:
            changes.append(ColumnChange(name, "type_changed", bt, ot))
        elif b[name].nullable != o[name].nullable:
            changes.append(
                ColumnChange(
                    name,
                    "nullability_changed",
                    str(b[name].nullable),
                    str(o[name].nullable),
                )
            )
    return changes


def has_drift(baseline: StructType, observed: StructType) -> bool:
    return bool(diff_schemas(baseline, observed))
