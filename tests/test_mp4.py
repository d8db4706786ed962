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


def test_frame_index_matches_file_bytes():
    """stsz/stsc/stco expansion: every indexed (offset, size) slice must
    equal the deterministic per-sample byte run the writer laid down —
    byte-for-byte, across chunk boundaries."""
    from cdc_application_febuary_spark.functions.mp4 import (
        encode_mp4_stub,
        frame_index,
    )

    sizes = [5, 9, 3, 7, 11, 4, 6, 2, 8]  # 9 samples, chunks of 4 -> 3 chunks
    content = encode_mp4_stub(
        duration_ms=9000, width=320, height=240,
        sample_sizes=sizes, samples_per_chunk=4, keyframes=[1, 5, 9],
    )
    rows = frame_index(content)
    assert len(rows) == len(sizes)
    assert [r["sample"] for r in rows] == list(range(1, 10))
    assert [r["size"] for r in rows] == sizes
    assert [r["keyframe"] for r in rows] == [
        s in (1, 5, 9) for s in range(1, 10)
    ]
    assert all(r["track_id"] == 1 for r in rows)
    for r in rows:
        s = r["sample"]
        expect = bytes((s * 31 + j) % 256 for j in range(r["size"]))
        assert content[r["offset"] : r["offset"] + r["size"]] == expect
    # offsets restart at each chunk base, not merely accumulate
    offs = [r["offset"] for r in rows]
    assert offs == sorted(offs)


def test_frame_index_no_stss_means_all_keyframes():
    from cdc_application_febuary_spark.functions.mp4 import (
        encode_mp4_stub,
        frame_index,
    )

    content = encode_mp4_stub(1000, sample_sizes=[4, 4, 4], keyframes=None)
    rows = frame_index(content)
    assert [r["keyframe"] for r in rows] == [True, True, True]


def test_frame_index_empty_for_metadata_only_container():
    from cdc_application_febuary_spark.functions.mp4 import (
        encode_mp4_stub,
        frame_index,
    )

    assert frame_index(encode_mp4_stub(1000, 320, 240)) == []


def test_frame_index_multi_stsc_runs():
    """A hand-built stsc with two runs (first chunk 2 samples, rest 3):
    the run boundary logic, not just the single-entry case."""
    import struct

    from cdc_application_febuary_spark.functions.mp4 import frame_index

    def box(tag, payload):
        return struct.pack(">I4s", 8 + len(payload), tag) + payload

    sizes = [2, 3, 4, 5, 6, 7, 8, 9]  # 8 samples: chunks = [2], [3], [3]
    stsz = box(b"stsz", struct.pack(">III", 0, 0, len(sizes))
               + b"".join(struct.pack(">I", s) for s in sizes))
    stsc = box(b"stsc", struct.pack(">II", 0, 2)
               + struct.pack(">III", 1, 2, 1)
               + struct.pack(">III", 2, 3, 1))
    stco = box(b"stco", struct.pack(">II", 0, 3)
               + struct.pack(">III", 1000, 2000, 3000))
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
               + struct.pack(">I", 7) + b"\x00" * 60 + struct.pack(">II", 0, 0))
    trak = box(b"trak", tkhd + box(b"mdia", box(b"minf", box(b"stbl",
               stsz + stsc + stco))))
    mvhd = box(b"mvhd", b"\x00" * 4 + struct.pack(">II", 0, 0)
               + struct.pack(">II", 1000, 1000) + b"\x00" * 80)
    content = (box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
               + box(b"moov", mvhd + trak))
    rows = frame_index(content)
    assert [(r["sample"], r["offset"]) for r in rows] == [
        (1, 1000), (2, 1002),            # chunk 1: sizes 2,3
        (3, 2000), (4, 2004), (5, 2009), # chunk 2: sizes 4,5,6
        (6, 3000), (7, 3007), (8, 3015), # chunk 3: sizes 7,8,9
    ]
    assert all(r["track_id"] == 7 for r in rows)
