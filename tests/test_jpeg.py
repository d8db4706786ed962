"""Baseline JPEG codec: roundtrip fidelity, format scope, dispatch."""

import numpy as np
import pytest

from cdc_application_febuary_spark.functions import jpeg


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_rgb_roundtrip_smooth_image_high_fidelity():
    img = _gradient(24, 33)  # non-multiple-of-8 dims exercise edge padding
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    rmse = np.sqrt(((out.astype(float) - img) ** 2).mean())
    assert rmse < 5.0


def test_flat_color_is_lossless_at_high_quality():
    flat = np.full((16, 16, 3), 120, np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=95))
    assert np.array_equal(out, flat)


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:19, 0:21]
    g = ((x + y) * 4 % 256).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    assert out.shape == g.shape
    assert np.sqrt(((out.astype(float) - g) ** 2).mean()) < 5.0


def test_lower_quality_smaller_file():
    img = _gradient(32, 32)
    hi = jpeg.encode_jpeg(img, quality=95)
    lo = jpeg.encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    # still decodable, just coarser
    out = jpeg.decode_jpeg(lo)
    assert out.shape == img.shape


def test_truncated_stream_raises():
    data = jpeg.encode_jpeg(_gradient(16, 16), quality=80)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[: len(data) // 2])


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG not a jpeg")


def test_decode_image_dispatches_jpeg():
    from cdc_application_febuary_spark.operators.multimodal import decode_image

    img = _gradient(16, 24)
    arr = decode_image(jpeg.encode_jpeg(img, quality=90))
    assert arr.shape == (16, 24, 3)
    # grayscale jpegs come back channel-stacked for a uniform (H, W, 3) API
    g = np.full((8, 8), 77, np.uint8)
    arr = decode_image(jpeg.encode_jpeg(g, quality=95))
    assert arr.shape == (8, 8, 3)
    assert int(arr.mean()) == 77


def test_mixed_corpus_decodes_every_format(spark):
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.operators import multimodal as mm

    media = mm.synthetic_media_mixed(spark, n=12)
    assert {r["format"] for r in media.select("format").distinct().collect()} == {
        "jpeg", "png", "ppm",
    }
    feats = mm.decode_features(media).collect()
    assert len(feats) == 12
    assert all(r["decode_error"] is None for r in feats)
    meta = {r["media_id"]: r for r in media.collect()}
    for r in feats:
        assert (r["width"], r["height"]) == (
            meta[r["media_id"]]["width"], meta[r["media_id"]]["height"],
        )
        assert r["channels"] == 3
