"""Real WAV decode path: roundtrip, signal statistics, quarantine."""

import numpy as np
import pytest

from cdc_application_febuary_spark.operators import multimodal as mm


def test_wav_roundtrip_exact():
    samples = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    rate, ch, arr = mm.decode_wav(mm.encode_wav(samples, 16_000))
    assert (rate, ch) == (16_000, 1)
    np.testing.assert_array_equal(arr[:, 0], samples)


def test_known_signal_statistics(spark):
    # full-scale square wave: rms == peak == 1 (up to int16 quantization)
    sq = (np.sign(np.sin(np.linspace(0, 50, 8000))) * 32767).astype(np.int16)
    df = spark.createDataFrame(
        [(1, "audio", "wav", bytearray(mm.encode_wav(sq, 8000)), None, None, 1000)],
        mm.MEDIA_SCHEMA,
    )
    r = mm.audio_features(df).first()
    assert r["sample_rate"] == 8000 and r["n_channels"] == 1
    assert r["n_samples"] == 8000 and r["duration_ms"] == 1000
    assert r["rms"] == pytest.approx(1.0, abs=1e-3)
    assert r["peak"] == pytest.approx(1.0, abs=1e-3)
    assert r["decode_error"] is None


def test_zero_crossing_rate_tracks_frequency(spark):
    rate = 16_000
    t = np.arange(rate) / rate

    def clip(i, freq):
        s = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        return (i, "audio", "wav", bytearray(mm.encode_wav(s, rate)), None, None, 1000)

    df = spark.createDataFrame([clip(1, 100), clip(2, 1000)], mm.MEDIA_SCHEMA)
    rows = {r["media_id"]: r["zero_cross_rate"] for r in mm.audio_features(df).collect()}
    # a sine at f Hz crosses zero 2f times per second -> rate 2f/sample_rate
    assert rows[1] == pytest.approx(200 / rate, rel=0.05)
    assert rows[2] == pytest.approx(2000 / rate, rel=0.05)


def test_corrupt_payload_quarantines_row(spark):
    good = (np.zeros(100, dtype=np.int16) + 1000).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, "audio", "wav", bytearray(mm.encode_wav(good, 8000)), None, None, 12),
            (2, "audio", "wav", bytearray(b"not a wav"), None, None, 0),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mm.audio_features(df).collect()}
    assert rows[1]["decode_error"] is None
    assert rows[2]["decode_error"] is not None
    assert rows[2]["sample_rate"] is None


def test_synthetic_corpus_decodes_clean(spark):
    media = mm.synthetic_media_wav(spark, n=16)
    feats = mm.audio_features(media)
    rows = feats.collect()
    assert len(rows) == 16
    assert all(r["decode_error"] is None for r in rows)
    # declared duration metadata matches decoded duration
    meta = {r["media_id"]: r["duration_ms"] for r in media.collect()}
    for r in rows:
        assert r["duration_ms"] == meta[r["media_id"]]
