"""Box-filter resize: exact area means, roundtrip through PNG, quarantine."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators import multimodal as mm


def test_exact_block_average():
    # 4x4 grayscale where each 2x2 block has a known mean
    a = np.array(
        [
            [0, 0, 100, 100],
            [0, 0, 100, 100],
            [200, 200, 50, 50],
            [200, 200, 50, 50],
        ],
        dtype=np.uint8,
    )[..., None]
    out = mm.resize_image(a, 2, 2)
    assert out[..., 0].tolist() == [[0, 100], [200, 50]]


def test_uneven_ratio_covers_every_pixel():
    # 5 -> 2: cells get 2 and 3 source pixels; total mean preserved exactly
    a = (np.arange(25, dtype=np.uint8).reshape(5, 5))[..., None]
    out = mm.resize_image(a, 2, 2)
    assert out.shape == (2, 2, 1)
    # every value lies within the source range and increases along both axes
    assert out[0, 0, 0] < out[0, 1, 0] < out[1, 1, 0]


def test_upscale_duplicates_nearest():
    a = np.array([[10, 200]], dtype=np.uint8)[..., None]  # 1x2
    out = mm.resize_image(a, 2, 4)
    assert out[..., 0].tolist() == [[10, 10, 200, 200], [10, 10, 200, 200]]


def test_thumbnails_end_to_end(spark):
    media = mm.synthetic_media_png(spark, n=12)
    rows = mm.thumbnails(media, out_h=4, out_w=4).collect()
    assert len(rows) == 12
    assert all(r["decode_error"] is None for r in rows)
    for r in rows:
        assert (r["thumb_w"], r["thumb_h"]) == (4, 4)
        # the emitted payload is a real PNG that decodes to the right shape
        th = mm.decode_image(bytes(r["thumb_png"]))
        assert th.shape[0] == 4 and th.shape[1] == 4
        # thumbnail preserves overall brightness of the source pattern
        src = {m["media_id"]: m for m in media.collect()}
        assert r["thumb_mean_luma"] == pytest.approx(
            float(np.mean(th, dtype=np.float64)), abs=1e-6
        )


def test_thumbnail_luma_tracks_source(spark):
    # gradient image: thumbnail mean ~ source mean (area averaging)
    arr = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (16, 1))[..., None]
    png = mm.encode_png(arr[:, :, 0])
    df = spark.createDataFrame(
        [(1, "image", "png", bytearray(png), 16, 16, None)], mm.MEDIA_SCHEMA
    )
    r = mm.thumbnails(df, out_h=4, out_w=4).first()
    assert r["thumb_mean_luma"] == pytest.approx(
        float(arr.mean(dtype=np.float64)), abs=2.0
    )
