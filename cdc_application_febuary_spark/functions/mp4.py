"""MP4/ISO-BMFF container metadata parsing — pure Python over the public
ISO 14496-12 box structure (the format every .mp4/.mov uses).

Frame DECODE genuinely needs ffmpeg (absent here — that path stays a
documented stub), but the container METADATA a pipeline actually
partitions/filters/samples on — duration, track count, resolution, brand
— lives in plain big-endian boxes this module reads directly: walk
``size|type`` box headers, descend into ``moov``/``trak``/``mdia``,
read ``mvhd`` (timescale + duration) and ``tkhd`` (16.16 fixed-point
width/height). A matching minimal writer (`encode_mp4_stub`) produces
structurally-valid containers in-process so the Spark path is tested
end-to-end on real bytes, not mocks.

Beyond the movie-level probe, `frame_index` reads the sample tables
(``stsz`` sizes, ``stsc`` sample-to-chunk runs, ``stco``/``co64`` chunk
offsets, ``stss`` sync samples) and emits one (track_id, sample, offset,
size, keyframe) row per frame — which turns "video frame decode" into a
pruned-SCAN problem: a pipeline can seek straight to the keyframe byte
ranges it wants (codec payload decode itself still needs ffmpeg).

Scope: version 0 and 1 mvhd/tkhd, no fragmented MP4 (moof), no codec
payloads. Out-of-scope structures raise with a precise message.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, box = struct.unpack_from(">I4s", data, pos)
        header = 8
        if size == 1:
            # 64-bit box: the 8 largesize bytes follow the type and are
            # part of the HEADER, not the payload (ISO 14496-12 §4.2)
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box {box!r} at {pos}")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {box!r} at {pos} (size {size})")
        yield box, pos + header, pos + size
        pos += size


def probe_mp4(content: bytes) -> dict:
    """{'major_brand', 'duration_ms', 'n_tracks', 'width', 'height'} from
    the container boxes. width/height come from the first video-sized
    track (tkhd with nonzero dimensions)."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    out = {
        "major_brand": content[8:12].decode("latin1"),
        "duration_ms": None,
        "n_tracks": 0,
        "width": None,
        "height": None,
    }

    def visit(start: int, end: int) -> None:
        for box, body, bend in _walk(content, start, end):
            if box == b"moof":
                raise ValueError("fragmented MP4 (moof) unsupported")
            if box == b"mvhd":
                version = content[body]
                if version == 1:
                    timescale, duration = struct.unpack_from(
                        ">IQ", content, body + 20
                    )
                elif version == 0:
                    timescale, duration = struct.unpack_from(
                        ">II", content, body + 12
                    )
                else:
                    raise ValueError(f"mvhd version {version} unsupported")
                if timescale:
                    out["duration_ms"] = int(duration * 1000 // timescale)
            elif box == b"trak":
                out["n_tracks"] += 1
                visit(body, bend)
                continue
            elif box == b"tkhd":
                version = content[body]
                ofs = body + (88 if version == 1 else 76)
                w_fx, h_fx = struct.unpack_from(">II", content, ofs)
                if w_fx and h_fx and out["width"] is None:
                    out["width"] = w_fx >> 16
                    out["height"] = h_fx >> 16
            if box in _CONTAINERS:
                visit(body, bend)

    visit(0, len(content))
    return out


def _full_box_entries(data: bytes, body: int, width: int) -> list[int]:
    """entry_count-prefixed big-endian integer list of a full box body."""
    (count,) = struct.unpack_from(">I", data, body + 4)
    fmt = {4: ">I", 8: ">Q"}[width]
    return [
        struct.unpack_from(fmt, data, body + 8 + i * width)[0]
        for i in range(count)
    ]


def _track_sample_tables(content: bytes, trak_body: int, trak_end: int) -> dict:
    """{'track_id', 'sizes', 'chunk_offsets', 'stsc', 'sync'} of one trak
    (sample-table keys absent when the track carries no stbl)."""
    out: dict = {}

    def visit(start: int, end: int) -> None:
        for box, body, bend in _walk(content, start, end):
            if box == b"tkhd":
                version = content[body]
                ofs = body + (20 if version == 1 else 12)
                out["track_id"] = struct.unpack_from(">I", content, ofs)[0]
            elif box == b"stsz":
                fixed, count = struct.unpack_from(">II", content, body + 4)
                out["sizes"] = (
                    [fixed] * count
                    if fixed
                    else [
                        struct.unpack_from(">I", content, body + 12 + 4 * i)[0]
                        for i in range(count)
                    ]
                )
            elif box == b"stco":
                out["chunk_offsets"] = _full_box_entries(content, body, 4)
            elif box == b"co64":
                out["chunk_offsets"] = _full_box_entries(content, body, 8)
            elif box == b"stsc":
                (count,) = struct.unpack_from(">I", content, body + 4)
                out["stsc"] = [
                    struct.unpack_from(">III", content, body + 8 + 12 * i)
                    for i in range(count)
                ]
            elif box == b"stss":
                out["sync"] = set(_full_box_entries(content, body, 4))
            elif box in _CONTAINERS:
                visit(body, bend)

    visit(trak_body, trak_end)
    return out


def frame_index(content: bytes) -> list[dict]:
    """Per-sample (frame) byte index from the container's sample tables.

    Returns one dict per sample: ``{'track_id', 'sample', 'offset',
    'size', 'keyframe'}`` (``sample`` is 1-based, matching ``stss``
    numbering; absent ``stss`` marks every sample a keyframe, per ISO
    14496-12 — tracks without sample tables contribute no rows). Offsets
    are absolute file offsets: chunk base from ``stco``/``co64`` plus the
    sizes of the chunk's preceding samples."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    rows: list[dict] = []

    def visit(start: int, end: int) -> None:
        for box, body, bend in _walk(content, start, end):
            if box == b"moof":
                raise ValueError("fragmented MP4 (moof) unsupported")
            if box == b"trak":
                tables = _track_sample_tables(content, body, bend)
                rows.extend(_expand_samples(tables))
            elif box == b"moov":
                visit(body, bend)

    visit(0, len(content))
    return rows


def _expand_samples(tables: dict) -> list[dict]:
    sizes = tables.get("sizes")
    chunk_offsets = tables.get("chunk_offsets")
    if not sizes or not chunk_offsets:
        return []
    stsc = tables.get("stsc") or [(1, len(sizes), 1)]
    sync = tables.get("sync")  # None -> all keyframes
    track_id = int(tables.get("track_id", 0))
    # samples_per_chunk for chunk i (1-based) = the run whose first_chunk
    # is the largest <= i; runs are ascending by first_chunk per spec
    rows: list[dict] = []
    sample = 1
    run = 0
    for ci, chunk_off in enumerate(chunk_offsets, start=1):
        while run + 1 < len(stsc) and stsc[run + 1][0] <= ci:
            run += 1
        per_chunk = stsc[run][1]
        offset = int(chunk_off)
        for _ in range(per_chunk):
            if sample > len(sizes):
                break
            size = int(sizes[sample - 1])
            rows.append(
                {
                    "track_id": track_id,
                    "sample": sample,
                    "offset": offset,
                    "size": size,
                    "keyframe": (sync is None) or (sample in sync),
                }
            )
            offset += size
            sample += 1
    return rows


def encode_mp4_stub(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    n_tracks: int = 1,
    brand: bytes = b"isom",
    sample_sizes: list[int] | None = None,
    samples_per_chunk: int = 4,
    keyframes: list[int] | None = None,
) -> bytes:
    """Structurally-valid metadata-only MP4: ftyp + moov(mvhd, trak(tkhd)
    x n) + mdat. No codec payload — enough container truth for the
    probe/partition/sample pipeline stages to run on real bytes.

    With ``sample_sizes``, track 1 additionally carries real sample
    tables (stsz/stsc/stco[/stss]) and the mdat holds one deterministic
    byte run per sample at the exact offsets the tables declare — so
    `frame_index` output can be verified byte-for-byte against the file.
    ``keyframes`` lists 1-based sync samples (None omits stss: every
    sample is a keyframe, per spec)."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(payload), tag) + payload

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"              # version 0 + flags
        + struct.pack(">II", 0, 0)        # creation/modification
        + struct.pack(">II", timescale, int(duration_ms))
        + b"\x00" * 80,                   # rate/volume/matrix/next-track
    )
    sizes = list(sample_sizes or [])
    n_chunks = (len(sizes) + samples_per_chunk - 1) // samples_per_chunk

    def build_moov(chunk_offsets: list[int]) -> bytes:
        traks = b""
        for i in range(n_tracks):
            w_fx = (width << 16) if i == 0 else 0
            h_fx = (height << 16) if i == 0 else 0
            tkhd = box(
                b"tkhd",
                b"\x00\x00\x00\x07"
                + struct.pack(">II", 0, 0)
                + struct.pack(">I", i + 1)    # track id
                + b"\x00" * 60                # reserved/duration/matrix
                + struct.pack(">II", w_fx, h_fx),
            )
            payload = tkhd
            if i == 0 and sizes:
                stsz = box(
                    b"stsz",
                    struct.pack(">III", 0, 0, len(sizes))
                    + b"".join(struct.pack(">I", s) for s in sizes),
                )
                stsc = box(
                    b"stsc",
                    struct.pack(">II", 0, 1)
                    + struct.pack(">III", 1, samples_per_chunk, 1),
                )
                stco = box(
                    b"stco",
                    struct.pack(">II", 0, n_chunks)
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets),
                )
                stbl = stsz + stsc + stco
                if keyframes is not None:
                    stbl += box(
                        b"stss",
                        struct.pack(">II", 0, len(keyframes))
                        + b"".join(
                            struct.pack(">I", k) for k in sorted(keyframes)
                        ),
                    )
                payload += box(b"mdia", box(b"minf", box(b"stbl", stbl)))
            traks += box(b"trak", payload)
        return box(b"moov", mvhd + traks)

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + b"isom")
    moov_len = len(build_moov([0] * n_chunks))
    mdat_payload_start = len(ftyp) + moov_len + 8
    chunk_offsets, pos = [], mdat_payload_start
    for c in range(n_chunks):
        chunk_offsets.append(pos)
        pos += sum(sizes[c * samples_per_chunk : (c + 1) * samples_per_chunk])
    mdat_payload = b"".join(
        bytes((s * 31 + j) % 256 for j in range(sz))
        for s, sz in enumerate(sizes, start=1)
    )
    moov = build_moov(chunk_offsets)
    assert len(moov) == moov_len
    return ftyp + moov + box(b"mdat", mdat_payload)
