"""MP4 container metadata: writer/parser roundtrip, scope errors, Spark
probe path with quarantine."""

import pytest

from cdc_application_febuary_spark.functions import mp4


def test_roundtrip_metadata():
    b = mp4.encode_mp4_stub(125_000, 1920, 1080, n_tracks=2, brand=b"mp42")
    info = mp4.probe_mp4(b)
    assert info == {
        "major_brand": "mp42",
        "duration_ms": 125_000,
        "n_tracks": 2,
        "width": 1920,
        "height": 1080,
    }


def test_audio_only_container_has_no_dimensions():
    b = mp4.encode_mp4_stub(30_000, 0, 0, n_tracks=1)
    info = mp4.probe_mp4(b)
    assert info["width"] is None and info["height"] is None
    assert info["duration_ms"] == 30_000


def test_non_bmff_rejected():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.probe_mp4(b"RIFF....WAVE definitely not mp4")


def test_malformed_box_rejected():
    b = bytearray(mp4.encode_mp4_stub(1000, 64, 48))
    b[20:24] = (10**9).to_bytes(4, "big")  # absurd box size inside moov
    with pytest.raises(ValueError):
        mp4.probe_mp4(bytes(b))


def test_video_metadata_over_spark(spark):
    from cdc_application_febuary_spark.operators import multimodal as mm

    media = mm.synthetic_media_mp4(spark, n=9)
    out = {r["media_id"]: r for r in mm.video_metadata(media).collect()}
    assert len(out) == 10  # 9 good + 1 quarantined
    meta = {r["media_id"]: r for r in media.collect()}
    for mid, r in out.items():
        if mid == 9:
            assert r["probe_error"] is not None
            continue
        assert r["probe_error"] is None
        assert r["duration_ms"] == meta[mid]["duration_ms"]
        assert r["width"] == meta[mid]["width"]
        assert r["n_tracks"] in (1, 2)
        assert r["major_brand"] == "isom"
