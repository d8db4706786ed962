"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition sizing, UDF signature, batch
shape) is real and tested. Image decode is REAL for PNG/PPM/BMP — a pure
Python/numpy codec over stdlib zlib (see ``decode_image``), exercised
end-to-end by ``synthetic_media_png`` + ``decode_features``. Formats that
need external codecs (JPEG, audio, video) raise NotImplementedError,
clearly marked; ``extract_features``' deterministic-fake mode remains for
engine-independent hashing tests.

Scale design: media bytes stay in executor memory one Arrow batch at a
time (mapInPandas is a streaming iterator — never a full-partition
materialization); metadata-only transforms never touch the bytes column
(column pruning drops it at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png | wav | mp4 | ...
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: content bytes are
    a seeded pattern, so hashes are stable across runs/engines."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                1000 * (i % 7) if kind != "image" else None,
            )
        )
    # createDataFrame splits tiny row sets across defaultParallelism
    # partitions — with mapInPandas downstream that spins up one Python
    # worker per partition for a handful of rows each; coalesce first.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


# ---------------------------------------------------------------------------
# Real image decode — pure Python/numpy over stdlib zlib, no PIL/opencv
# needed. Covers PNG (8-bit gray/RGB/palette/gray+alpha/RGBA, all five
# scanline filters), binary PPM (P6), and uncompressed 24/32-bit BMP; PIL
# is still preferred when present. Runs inside Arrow batches on executors,
# so decode throughput scales with partitions, not the driver.
# ---------------------------------------------------------------------------
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: "np.ndarray") -> bytes:
    """Minimal PNG writer (filter 0, 8-bit gray/RGB/RGBA) — exists so tests
    and the synthetic fixture can round-trip real PNGs in-container."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png(content: bytes) -> "np.ndarray":
    import struct
    import zlib

    import numpy as np

    pos, chunks, palette = len(_PNG_MAGIC), [], None
    ihdr = None
    while pos < len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            chunks.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _, _, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} unsupported"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(chunks)), np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    filters, data = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    c = channels  # byte offset of the pixel to the left
    for y in range(h):
        f, row = int(filters[y]), data[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            for x in range(stride):
                row[x] = (row[x] + (row[x - c] if x >= c else 0)) & 0xFF
            out[y] = row
        elif f == 2:  # Up
            out[y] = (row + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                row[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # Paeth
            for x in range(stride):
                a = row[x - c] if x >= c else 0
                b = prior[x]
                cc = prior[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[x] = (row[x] + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def _decode_ppm(content: bytes) -> "np.ndarray":
    import numpy as np

    # P6 header: magic, width, height, maxval (ASCII, #-comments allowed)
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while content[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    data = np.frombuffer(content, np.uint8, count=w * h * 3, offset=pos + 1)
    return data.reshape(h, w, 3)


def _decode_bmp(content: bytes) -> "np.ndarray":
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    c = bpp // 8
    stride = (w * c + 3) & ~3
    rows = []
    flipped = h > 0
    h = abs(h)
    for y in range(h):
        off = data_off + y * stride
        row = np.frombuffer(content, np.uint8, count=w * c, offset=off)
        rows.append(row.reshape(w, c)[:, :3][:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if flipped else img


def decode_image(content: bytes) -> "np.ndarray":
    """Decode PNG/PPM/BMP/JPEG bytes to an (H, W, C) uint8 numpy array.

    Uses PIL when importable; otherwise the pure-Python decoders above
    (stdlib zlib + numpy — nothing beyond the baked-in deps). JPEG runs
    through the engine's own baseline codec (`functions/jpeg.py` —
    baseline sequential 4:4:4/grayscale; progressive or subsampled files
    raise with a precise message). Video stays NotImplementedError —
    container formats genuinely need ffmpeg."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image
        import numpy as np

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError:
        pass
    if content[:8] == _PNG_MAGIC:
        return _decode_png(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] == b"\xff\xd8":
        import numpy as np

        from ..functions.jpeg import decode_jpeg

        arr = decode_jpeg(content)
        return arr if arr.ndim == 3 else np.stack([arr] * 3, axis=-1)
    raise NotImplementedError(
        "only PNG/PPM/BMP/baseline-JPEG decodable without external codecs "
        "(video needs ffmpeg, absent in this container)"
    )


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Per-media feature extraction over mapInPandas (Arrow batches).

    With ``deterministic_fake`` the 'feature' is byte-length + md5 — enough
    to exercise batch shape, schema and partitioning; flip it off to hit the
    NotImplementedError decode stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not deterministic_fake:
                decode_image(b"")  # raises NotImplementedError
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["content"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature_dim": pdf["content"].map(lambda b: 16),
                }
            )
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def synthetic_media_png(spark, n: int = 48) -> DataFrame:
    """Image table whose payloads are REAL PNGs (deterministic gradient +
    checker patterns, encoded in-process) — the real-decode path runs
    end-to-end in-container with reproducible pixel statistics."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 2:  # gradient RGB
            arr = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    np.full_like(xx, i * 5 % 256),
                ],
                axis=2,
            ).astype(np.uint8)
        else:  # checkerboard gray
            arr = (((xx // 4 + yy // 4) % 2) * 255).astype(np.uint8)
        rows.append((i, "image", "png", bytearray(encode_png(arr)), w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def synthetic_media_mixed(spark, n: int = 48) -> DataFrame:
    """Image table mixing REAL in-process encodings across formats —
    JPEG (the engine's own baseline codec), PNG, and binary PPM — so the
    decode path exercises every dispatch branch in one corpus. Patterns
    are smooth gradients (JPEG-friendly: the lossy roundtrip stays within
    a few gray levels, keeping luma statistics meaningful)."""
    import numpy as np

    from ..functions.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                np.full_like(xx, i * 5 % 256),
            ],
            axis=2,
        ).astype(np.uint8)
        if i % 3 == 0:
            fmt, payload = "jpeg", encode_jpeg(arr, quality=90)
        elif i % 3 == 1:
            fmt, payload = "png", encode_png(arr)
        else:
            fmt = "ppm"
            payload = b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
        rows.append((i, "image", fmt, bytearray(payload), w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def decode_features(media: DataFrame) -> DataFrame:
    """Real per-image decode over mapInPandas: width/height/channels and
    mean luminance from the actual pixels. Decode failures land in
    `decode_error` instead of killing the batch — at 100 TB a corrupt
    object must cost one row, not a stage retry loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            recs = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                    luma = float(np.mean(img, dtype=np.float64))
                    recs.append(
                        (
                            int(mid),
                            int(img.shape[1]),
                            int(img.shape[0]),
                            int(img.shape[2]),
                            round(luma, 6),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    recs.append((int(mid), None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_luma",
                    "decode_error",
                ],
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, DECODE_SCHEMA
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — note: never references `content`, so Catalyst
    prunes the binary column out of the scan entirely."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("duration_ms").alias("avg_duration_ms"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode each video into frame
    timestamps (decode stubbed). Produces (media_id, frame_ts_ms) rows —
    the partition-explosion shape a real sampler would feed to a decoder."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Real audio decode — stdlib `wave` (PCM WAV), no external codec needed.
# Same posture as the PNG path: decode runs inside Arrow batches on
# executors, corrupt payloads quarantine per-row, and metadata-only
# queries never touch the bytes.
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zero_cross_rate", DoubleType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def encode_wav(samples, rate: int = 16_000, channels: int = 1) -> bytes:
    """16-bit PCM WAV bytes from an int16 sample array (stdlib wave)."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes):
    """(rate, channels, int16 array shaped (frames, channels)) from PCM WAV."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {w.getsampwidth()}")
        rate, ch = w.getframerate(), w.getnchannels()
        frames = w.readframes(w.getnframes())
    arr = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    return rate, ch, arr


def synthetic_media_wav(spark, n: int = 32) -> DataFrame:
    """Audio table whose payloads are REAL PCM WAVs (deterministic sine /
    square tones at varying rates), so the decode path runs end-to-end
    in-container with reproducible signal statistics."""
    import numpy as np

    rows = []
    for i in range(n):
        rate = (8_000, 16_000, 22_050)[i % 3]
        dur_s = 0.05 + (i % 4) * 0.05
        t = np.arange(int(rate * dur_s)) / rate
        freq = 220.0 * (1 + i % 5)
        wave_f = np.sin(2 * np.pi * freq * t)
        if i % 2:
            wave_f = np.sign(wave_f)  # square tone
        samples = (wave_f * (0.1 + 0.2 * (i % 4)) * 32767).astype(np.int16)
        rows.append(
            (
                i,
                "audio",
                "wav",
                bytearray(encode_wav(samples, rate)),
                None,
                None,
                int(len(samples) * 1000 / rate),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def audio_features(media: DataFrame) -> DataFrame:
    """Real per-clip decode over mapInPandas: sample rate, channel count,
    duration, RMS/peak amplitude (normalized to [-1, 1]) and zero-crossing
    rate from the actual samples. Failures quarantine per-row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            recs = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, ch, arr = decode_wav(bytes(content))
                    x = arr.astype(np.float64) / 32768.0
                    mono = x.mean(axis=1)
                    flips = np.signbit(mono[1:]) != np.signbit(mono[:-1])
                    recs.append(
                        (
                            int(mid),
                            int(rate),
                            int(ch),
                            int(len(arr)),
                            int(len(arr) * 1000 / rate),
                            round(float(np.sqrt(np.mean(x**2))), 6),
                            round(float(np.abs(x).max()), 6),
                            round(float(flips.mean()) if len(mono) > 1 else 0.0, 6),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    recs.append(
                        (int(mid), None, None, None, None, None, None, None,
                         str(e)[:200])
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        batches, AUDIO_SCHEMA
    )


def resize_image(arr, out_h: int, out_w: int):
    """Area-average (box-filter) resize of an HxWxC uint8 array — pure
    numpy, no PIL. Exact mean over each target cell's source-pixel box
    (cells are built from the integer edge grid, so every source pixel
    contributes to exactly one cell per axis); correct for downscaling,
    nearest-duplication for upscaling."""
    import numpy as np

    a = np.asarray(arr)
    h, w, c = a.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        row = a[y0:y1]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = row[:, x0:x1].mean(axis=(0, 1))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("thumb_w", IntegerType(), True),
        StructField("thumb_h", IntegerType(), True),
        StructField("thumb_png", BinaryType(), True),
        StructField("thumb_mean_luma", DoubleType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def thumbnails(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode -> box-filter resize -> re-encode PNG thumbnails, all inside
    Arrow batches on executors (the standard multimodal preprocessing
    stage: normalize every image to a fixed grid for a vision encoder).
    Output payloads are real PNGs; failures quarantine per-row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            recs = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                    th = resize_image(img, out_h, out_w)
                    luma = float(np.mean(th, dtype=np.float64))
                    recs.append(
                        (
                            int(mid),
                            int(img.shape[1]),
                            int(img.shape[0]),
                            out_w,
                            out_h,
                            bytearray(encode_png(th)),
                            round(luma, 6),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    recs.append(
                        (int(mid), None, None, None, None, None, None,
                         str(e)[:200])
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        batches, RESIZE_SCHEMA
    )


def synthetic_media_mp4(
    spark, n: int = 24, with_samples: bool = False
) -> DataFrame:
    """Video table whose payloads are REAL (metadata-only) MP4 containers
    built in-process (`functions/mp4.encode_mp4_stub`) — the probe path
    runs on actual ISO-BMFF bytes; one malformed payload exercises the
    per-row quarantine. ``with_samples`` adds real stsz/stsc/stco/stss
    sample tables (one "frame" byte-run per sample in the mdat) so the
    frame-index path also runs on true container bytes."""
    from ..functions.mp4 import encode_mp4_stub

    rows = []
    for i in range(n):
        dur = 1000 * (10 + i * 7)
        w, h = 320 + (i % 3) * 320, 240 + (i % 3) * 240
        kwargs = {}
        if with_samples:
            n_frames = 6 + (i % 5)
            kwargs = {
                "sample_sizes": [16 + ((i + s) % 7) for s in range(n_frames)],
                "samples_per_chunk": 4,
                # GOP-ish: a keyframe every 3rd sample, always sample 1
                "keyframes": list(range(1, n_frames + 1, 3)),
            }
        payload = encode_mp4_stub(dur, w, h, n_tracks=1 + i % 2, **kwargs)
        rows.append((i, "video", "mp4", bytearray(payload), w, h, dur))
    rows.append((n, "video", "mp4", bytearray(b"\x00\x00\x00\x08brok"), None, None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


VIDEO_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("major_brand", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("probe_error", StringType(), True),
    ]
)


def video_metadata(media: DataFrame) -> DataFrame:
    """Container-level probe of video payloads over mapInPandas: brand,
    duration, track count, resolution from the real MP4 boxes
    (`functions/mp4.py`). Frame decode stays a documented stub (needs
    ffmpeg); malformed containers quarantine per row."""
    from ..functions.mp4 import probe_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    info = probe_mp4(bytes(content))
                    recs.append(
                        (
                            int(mid),
                            info["major_brand"],
                            info["duration_ms"],
                            int(info["n_tracks"]),
                            info["width"],
                            info["height"],
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    recs.append(
                        (int(mid), None, None, None, None, None, str(e)[:200])
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "major_brand",
                    "duration_ms",
                    "n_tracks",
                    "width",
                    "height",
                    "probe_error",
                ],
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        batches, VIDEO_PROBE_SCHEMA
    )


FRAME_INDEX_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("track_id", IntegerType(), True),
        StructField("sample", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("size", LongType(), True),
        StructField("keyframe", BooleanType(), True),
        StructField("index_error", StringType(), True),
    ]
)


def video_frame_table(media: DataFrame) -> DataFrame:
    """Per-frame byte index of every video payload: one row per sample
    with its absolute (offset, size) span and keyframe flag, from the
    real stsz/stsc/stco/stss sample tables (`functions/mp4.frame_index`).

    This is the Spark form of "video frame decode as a pruned-scan
    problem": downstream frame-sampling filters on ``keyframe`` and reads
    only those byte ranges — the codec payload never rides the shuffle,
    and the per-row quarantine column keeps malformed containers from
    failing the batch. Arrow-batched mapInPandas; output volume is one
    small row per frame, independent of payload bytes."""
    from ..functions.mp4 import frame_index

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = frame_index(bytes(content))
                    if not frames:
                        recs.append(
                            (int(mid), None, None, None, None, None, None)
                        )
                    for fr in frames:
                        recs.append(
                            (
                                int(mid),
                                fr["track_id"],
                                fr["sample"],
                                fr["offset"],
                                fr["size"],
                                fr["keyframe"],
                                None,
                            )
                        )
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    recs.append(
                        (int(mid), None, None, None, None, None, str(e)[:200])
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "track_id",
                    "sample",
                    "offset",
                    "size",
                    "keyframe",
                    "index_error",
                ],
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        batches, FRAME_INDEX_SCHEMA
    )
