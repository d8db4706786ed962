"""Baseline JPEG codec in pure numpy — no libjpeg in this container, so
the engine carries its own minimal implementation of the public ITU T.81
baseline sequential process (the format every camera/web JPEG uses):

* encoder: level shift -> 8x8 DCT-II -> quantization (Annex-K-style
  tables scaled by quality) -> zigzag -> DC differential + AC
  run-length/size coding -> canonical Huffman, 4:4:4 YCbCr (or single
  component for grayscale), tables embedded in DQT/DHT segments;
* decoder: generic marker parse (SOI/APP/DQT/SOF0/DHT/SOS), canonical
  Huffman decode with byte-unstuffing, dequant, IDCT, YCbCr->RGB. The
  decoder trusts the tables IN THE FILE, so it reads any baseline
  4:4:4/grayscale JPEG, not just its own output.

Scope (documented, checked, raising beyond it): baseline DCT process
only — no progressive scans, no chroma subsampling, no restart
intervals, 8-bit precision. That covers the synthetic fixtures and the
round-trip contract the multimodal operators need; subsampled/progressive
files raise with a precise message rather than decoding garbage.

Used by `operators/multimodal.decode_image` for the 0xFFD8 magic.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: index i holds the (row*8+col) position of the i-th
# coefficient in scan order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex-K base quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Huffman table specs: (bits[1..16], symbols) — canonical-code order
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))


def _ac_symbols() -> list[int]:
    """AC symbol order for our encoder's tables: all (run, size) pairs in
    a fixed layout — EOB, sizes 1-10 for run 0, then runs 1-15, then ZRL.
    The spec is embedded in the DHT segment, so any consistent layout is a
    valid Huffman table; external files bring their own."""
    syms = [0x00]  # EOB
    for size in range(1, 11):
        syms.append(size)  # run 0
    for run in range(1, 16):
        for size in range(1, 11):
            syms.append((run << 4) | size)
    syms.append(0xF0)  # ZRL
    return syms


def _length_limited_bits(nsyms: int) -> list[int]:
    """A valid (Kraft-satisfying) 16-limited length distribution for
    ``nsyms`` equal-weight symbols: fill the shallowest complete level."""
    import math

    depth = max(1, math.ceil(math.log2(nsyms)))
    if depth > 16:
        raise ValueError("too many symbols")
    bits = [0] * 16
    bits[depth - 1] = nsyms
    return bits


AC_LUMA = (_length_limited_bits(len(_ac_symbols())), _ac_symbols())
AC_CHROMA = AC_LUMA


def _canonical_codes(bits, symbols):
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for u in range(n):
        cu = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
        for x in range(n):
            m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / (2 * n))
    return m


_DCT = _dct_matrix()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v else 0


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _quality_scale(quality: int) -> float:
    quality = min(100, max(1, quality))
    return (5000 / quality if quality < 50 else 200 - 2 * quality) / 100.0


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 to baseline JFIF."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    scale = _quality_scale(quality)
    qts = [np.clip(np.round(QT_LUMA * scale), 1, 255)]
    if not gray:
        qts.append(np.clip(np.round(QT_CHROMA * scale), 1, 255))

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        planes = [ycc[..., i] for i in range(3)]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    dc_specs = [DC_LUMA] if gray else [DC_LUMA, DC_CHROMA]
    ac_specs = [AC_LUMA] if gray else [AC_LUMA, AC_CHROMA]
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    bw = _BitWriter()
    preds = [0] * len(planes)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                ti = 0 if ci == 0 else 1
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                q = np.round(coef.ravel() / qts[ti]).astype(np.int64)
                zz = q[ZIGZAG]
                dc, acs = int(zz[0]), zz[1:]
                diff = dc - preds[ci]
                preds[ci] = dc
                size = _category(diff)
                code, length = dc_codes[ti][size]
                bw.write(code, length)
                if size:
                    bw.write(_amplitude_bits(diff, size), size)
                run = 0
                nz = np.nonzero(acs)[0]
                last = nz[-1] if len(nz) else -1
                for i, v in enumerate(acs[: last + 1]):
                    v = int(v)
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[ti][0xF0]
                        bw.write(c, ln)
                        run -= 16
                    size = _category(v)
                    c, ln = ac_codes[ti][(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(_amplitude_bits(v, size), size)
                    run = 0
                if last < 62:
                    c, ln = ac_codes[ti][0x00]
                    bw.write(c, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qts):
        zzq = qt.ravel()[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([ti]) + zzq)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for ti, (bits, syms) in enumerate(dc_specs):
        out += seg(0xC4, bytes([ti]) + bytes(bits) + bytes(syms))
    for ti, (bits, syms) in enumerate(ac_specs):
        out += seg(0xC4, bytes([0x10 | ti]) + bytes(bits) + bytes(syms))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError("unexpected marker inside entropy stream")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline 4:4:4 / grayscale JFIF to uint8 (h, w, 3) or (h, w)."""
    try:
        return _decode_jpeg(data)
    except IndexError as exc:  # short reads while parsing headers
        raise ValueError("truncated JPEG") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[ZIGZAG] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = t
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                syms = list(body[p + 17 : p + 17 + n])
                codes = _canonical_codes(bits, syms)
                huff[(tc, th)] = {(c, ln): s for s, (c, ln) in codes.items()}
                p += 17 + n
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (baseline 4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            pos += seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")

    reader = _BitReader(data[pos:])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.zeros((ph, pw)) for _ in comps]
    preds = [0] * len(comps)
    qt_of = {cid: qts[tq] for cid, tq in comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, td, ta) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                size = _decode_huffman(reader, huff[(0, td)])
                diff = _extend(reader.read_bits(size), size) if size else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _decode_huffman(reader, huff[(1, ta)])
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(reader.read_bits(size), size)
                    k += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = zz * qt_of[cid]
                block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                planes[ci][by : by + 8, bx : bx + 8] = block + 128.0
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
