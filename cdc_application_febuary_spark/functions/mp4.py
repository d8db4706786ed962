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


def encode_mp4_stub(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    n_tracks: int = 1,
    brand: bytes = b"isom",
) -> bytes:
    """Structurally-valid metadata-only MP4: ftyp + moov(mvhd, trak(tkhd)
    x n) with an empty mdat. No codec payload — enough container truth for
    the probe/partition/sample pipeline stages to run on real bytes."""

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
        traks += box(b"trak", tkhd)
    return (
        box(b"ftyp", brand + struct.pack(">I", 0) + b"isom")
        + box(b"moov", mvhd + traks)
        + box(b"mdat", b"")
    )
