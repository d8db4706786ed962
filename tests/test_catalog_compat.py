"""Catalog resilience across fixture generations: events.ts arrived as
TIMESTAMP(NANOS) parquet in round 1 and TIMESTAMP(MICROS) in round 2 —
the catalog must normalize BOTH to identical epoch-nanos, with the range
filter predicating the native column either way."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.catalog import (
    events_ts,
    load_events_raw,
    load_table,
    push_ts_filter,
    ts_nanos,
)

TS = [1704067200_000_000_000 + i * 3_600_000_000_000 for i in range(8)]


def _write(tmp_path, name, unit):
    vals = [t // (1000 if unit == "us" else 1) for t in TS]
    table = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(vals, pa.timestamp(unit)),
            "user_id": pa.array([i % 3 for i in range(8)], pa.int64()),
            "event_type": pa.array(["click"] * 8),
            "value": pa.array([float(i) for i in range(8)]),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_raw_nanos_identical_across_generations(spark, tmp_path, unit):
    sf = _write(tmp_path, f"gen_{unit}", unit)
    raw = load_events_raw(spark, sf)
    assert dict(raw.dtypes)["ts"] == "bigint"
    got = [r["ts"] for r in raw.orderBy("event_id").collect()]
    assert got == TS


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_push_ts_filter_selects_same_rows(spark, tmp_path, unit):
    sf = _write(tmp_path, f"flt_{unit}", unit)
    bound = "2024-01-01 03:00:00"  # keeps events 3..7
    out = push_ts_filter(spark, sf, bound)
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [3, 4, 5, 6, 7]
    assert all(r["ts"] >= ts_nanos(bound) for r in out.collect())


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_yields_plain_timestamp(spark, tmp_path, unit):
    sf = _write(tmp_path, f"lt_{unit}", unit)
    df = load_table(spark, sf, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    first = df.orderBy("event_id").first()["ts"]
    assert first.year == 2024 and first.hour == 0


def test_events_ts_roundtrip_consistency(spark, tmp_path):
    a = events_ts(load_events_raw(spark, _write(tmp_path, "rt_ns", "ns")))
    b = events_ts(load_events_raw(spark, _write(tmp_path, "rt_us", "us")))
    assert [r["ts"] for r in a.orderBy("event_id").collect()] == [
        r["ts"] for r in b.orderBy("event_id").collect()
    ]
