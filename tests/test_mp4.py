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


def test_largesize_box_body_offset():
    """ADVICE r2: a size==1 (64-bit) box carries an 8-byte largesize after
    the type; the body starts at +16, not +8 — parsing the largesize bytes
    as payload mis-reads every field after it."""
    import struct

    from cdc_application_febuary_spark.functions.mp4 import (
        encode_mp4_stub,
        probe_mp4,
    )

    normal = encode_mp4_stub(duration_ms=1234, width=64, height=32)
    # rewrite the moov box header to the 64-bit form
    ftyp_len = struct.unpack_from(">I", normal, 0)[0]
    moov_len, tag = struct.unpack_from(">I4s", normal, ftyp_len)
    assert tag == b"moov"
    moov_payload = normal[ftyp_len + 8 : ftyp_len + moov_len]
    large_moov = (
        struct.pack(">I4sQ", 1, b"moov", 16 + len(moov_payload)) + moov_payload
    )
    rebuilt = normal[:ftyp_len] + large_moov + normal[ftyp_len + moov_len :]
    assert probe_mp4(rebuilt) == probe_mp4(normal)


def test_truncated_largesize_box_raises():
    import struct

    import pytest

    from cdc_application_febuary_spark.functions.mp4 import (
        encode_mp4_stub,
        probe_mp4,
    )

    normal = encode_mp4_stub(duration_ms=10)
    ftyp_len = struct.unpack_from(">I", normal, 0)[0]
    # size==1 header but only 12 bytes remain — no full largesize field
    bad = normal[:ftyp_len] + struct.pack(">I4s", 1, b"moov") + b"\x00" * 4
    with pytest.raises(ValueError, match="largesize|malformed"):
        probe_mp4(bad)
