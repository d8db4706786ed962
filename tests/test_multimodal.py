"""Multimodal plumbing: Arrow-batched feature extraction over binary
columns, metadata-only pruning, frame-sampling plan, and the real
PNG/PPM/BMP decode path (pure numpy/zlib codec)."""

import struct
import zlib

import numpy as np
import pytest

from cdc_application_febuary_spark.operators.multimodal import (
    _PNG_MAGIC,
    decode_features,
    decode_image,
    encode_png,
    extract_features,
    frame_sample_plan,
    media_metadata_stats,
    synthetic_media,
    synthetic_media_png,
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


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not decodable here")  # no GIF codec
    # JPEG now decodes via functions/jpeg.py; malformed bytes raise
    # ValueError from the codec, not NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 not a real scan")


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


def _rng_img(seed: int, h: int, w: int, c: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return arr[:, :, 0] if c == 1 else arr


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    arr = _rng_img(7 + channels, 13, 17, channels)
    out = decode_image(encode_png(arr))
    expect = arr[:, :, None] if channels == 1 else arr
    assert out.shape == expect.shape
    assert np.array_equal(out, expect)


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter codes — covers
    the Sub/Up/Average/Paeth inverse paths the plain encoder (filter 0)
    never hits."""
    h, w, c = arr.shape
    a32 = arr.astype(np.int32)
    lines = []
    for y in range(h):
        row = a32[y].reshape(-1)
        prior = a32[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        pleft = np.concatenate([np.zeros(c, np.int32), prior[:-c]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prior
        elif f == 3:
            enc = row - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - pleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft)
            )
            enc = row - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filters(filters):
    arr = _rng_img(11, 9, 8, 3)
    out = decode_image(_png_with_filters(arr, filters))
    assert np.array_equal(out, arr)


def test_png_palette():
    # 2x3 palette image: indices into a 4-color PLTE
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(png), palette[idx])


def test_ppm_decode():
    arr = _rng_img(3, 5, 4, 3)
    ppm = b"P6\n# comment\n4 5\n255\n" + arr.tobytes()
    assert np.array_equal(decode_image(ppm), arr)


def test_bmp_decode():
    arr = _rng_img(5, 3, 3, 3)  # 3 rows x 3 cols RGB
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = arr[y][:, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (stride - len(bgr)))
    pix = b"".join(rows)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    assert np.array_equal(decode_image(header + pix), arr)


def test_decode_features_on_real_pngs(spark):
    media = synthetic_media_png(spark, n=12)
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    meta = {r["media_id"]: r for r in media.collect()}
    assert len(feats) == 12
    for mid, r in feats.items():
        assert r["decode_error"] is None
        assert r["width"] == meta[mid]["width"]
        assert r["height"] == meta[mid]["height"]
        # even checkerboards (i%2==0) are half 0 / half 255
        if mid % 2 == 0:
            assert r["channels"] == 1
            assert 90 <= r["mean_luma"] <= 165
        else:
            assert r["channels"] == 3


def test_decode_features_quarantines_bad_bytes(spark):
    from cdc_application_febuary_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (0, "image", "png", bytearray(b"not an image"), None, None, None),
        (1, "image", "png", bytearray(encode_png(np.zeros((2, 2), np.uint8))),
         2, 2, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[0]["decode_error"] is not None and out[0]["width"] is None
    assert out[1]["decode_error"] is None and out[1]["mean_luma"] == 0.0


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


def test_video_frame_table_spans_and_quarantine(spark):
    """Frame indexing through Spark: per-sample byte spans come back for
    every sample-table-carrying container, keyframes follow the planted
    every-3rd GOP pattern, and the malformed payload quarantines per-row."""
    from cdc_application_febuary_spark.operators import multimodal

    media = multimodal.synthetic_media_mp4(spark, n=6, with_samples=True)
    rows = multimodal.video_frame_table(media).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # media 0..5 planted 6 + (i % 5) frames each
    for i in range(6):
        frames = [r for r in by_media[i] if r["sample"] is not None]
        assert len(frames) == 6 + (i % 5)
        keys = [r["sample"] for r in frames if r["keyframe"]]
        assert keys == list(range(1, len(frames) + 1, 3))
        offs = sorted(r["offset"] for r in frames)
        assert offs[0] > 0 and len(set(offs)) == len(offs)
    # the malformed trailer row quarantines with an index_error
    bad = by_media[6]
    assert len(bad) == 1 and bad[0]["index_error"] is not None


def test_video_frame_table_metadata_only_yields_no_frames(spark):
    from cdc_application_febuary_spark.operators import multimodal

    media = multimodal.synthetic_media_mp4(spark, n=4, with_samples=False)
    rows = multimodal.video_frame_table(media).collect()
    assert all(r["sample"] is None for r in rows)
