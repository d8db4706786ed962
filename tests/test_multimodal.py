"""Multimodal plumbing: Arrow-batched feature extraction over binary
columns, metadata-only pruning, frame-sampling plan, stubbed decode."""

import pytest

from cdc_application_febuary_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample_plan,
    media_metadata_stats,
    synthetic_media,
)


def test_extract_features_deterministic(spark):
    media = synthetic_media(spark, n=12)
    a = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
    assert a == b and len(a) == 12
    assert all(len(h) == 32 for h in a.values())  # md5 hex


def test_extract_features_schema(spark):
    out = extract_features(synthetic_media(spark, n=3))
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "byte_len", "content_hash", "feature_dim",
    ]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_metadata_stats_prunes_content(spark, tmp_path):
    # Pruning is observable at a file scan (ReadSchema), not a LocalRelation:
    # persist then read back, and assert the binary column never leaves disk.
    path = str(tmp_path / "media")
    synthetic_media(spark, n=12).write.parquet(path)
    stats = media_metadata_stats(spark.read.parquet(path))
    physical = stats._jdf.queryExecution().executedPlan().toString()
    assert "content" not in physical  # binary column pruned from the scan
    rows = {r["kind"]: r["n"] for r in stats.collect()}
    assert rows == {"image": 4, "audio": 4, "video": 4}


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=12)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in frames)
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    # duration k*1000 samples k frames (0..k*1000-1 step 1000); duration 0 -> 1
    durations = {r["media_id"]: r["duration_ms"] for r in media.collect()
                 if r["kind"] == "video"}
    for mid, ts in by_id.items():
        assert len(ts) == max(1, durations[mid] // 1000)
