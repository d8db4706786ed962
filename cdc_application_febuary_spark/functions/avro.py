"""Pure-Python Avro Object Container File support (S6's last format leg).

Spark's `spark-avro` module is external (since 2.4) and its jar is not in
this container, so — same strategy as `functions/jpeg.py` — the format is
implemented from the public specification
(https://avro.apache.org/docs/current/specification/): binary encoding
(zigzag-varint longs, little-endian IEEE floats, length-prefixed bytes),
the object container framing (magic `Obj\\x01`, metadata map with
`avro.schema`/`avro.codec`, 16-byte sync marker, sync-delimited blocks),
and the `null` + `deflate` codecs (raw zlib, wbits=-15).

Scope: record schemas over the primitive types Spark's fixtures need
(boolean, int, long, float, double, string, bytes) plus the nullable
union `["null", T]`. That covers the reference's S3 object-scan payloads;
logical types (decimal, timestamp) are documented out.

Scale posture: the WRITE path runs per-partition on executors
(`write_avro`, foreachPartition — one container file per partition, like
Spark's own file sinks); the READ path lists the directory as Spark
`binaryFile` rows and decodes each container on an executor via
`mapInPandas` (Arrow-batched), so both directions distribute. Only the
schema peek (one file header) touches the driver.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _zigzag_decode(acc)


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    return buf.read(n)


_PRIMITIVE_WRITERS = {
    "null": lambda buf, v: None,
    "boolean": lambda buf, v: buf.write(b"\x01" if v else b"\x00"),
    "int": write_long,
    "long": write_long,
    "float": lambda buf, v: buf.write(struct.pack("<f", float(v))),
    "double": lambda buf, v: buf.write(struct.pack("<d", float(v))),
    "bytes": write_bytes,
    "string": lambda buf, v: write_bytes(buf, v.encode("utf-8")),
}

_PRIMITIVE_READERS = {
    "null": lambda buf: None,
    "boolean": lambda buf: buf.read(1) == b"\x01",
    "int": read_long,
    "long": read_long,
    "float": lambda buf: struct.unpack("<f", buf.read(4))[0],
    "double": lambda buf: struct.unpack("<d", buf.read(8))[0],
    "bytes": read_bytes,
    "string": lambda buf: read_bytes(buf).decode("utf-8"),
}


def _write_value(buf: io.BytesIO, typ, v) -> None:
    if isinstance(typ, list):  # union — ["null", T] only
        if v is None:
            write_long(buf, typ.index("null"))
        else:
            idx = 1 if typ[0] == "null" else 0
            write_long(buf, idx)
            _write_value(buf, typ[idx], v)
        return
    _PRIMITIVE_WRITERS[typ](buf, v)


def _read_value(buf: io.BytesIO, typ):
    if isinstance(typ, list):
        idx = read_long(buf)
        return _read_value(buf, typ[idx])
    return _PRIMITIVE_READERS[typ](buf)


# ---------------------------------------------------------------------------
# schema mapping Spark <-> Avro
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def avro_schema_for(spark_schema, name: str = "record0") -> dict:
    """Avro record schema for a Spark StructType (primitives + nullable)."""
    fields = []
    for f in spark_schema.fields:
        s = f.dataType.simpleString()
        if s not in _SPARK_TO_AVRO:
            raise ValueError(f"unsupported Spark type for Avro: {s}")
        t = _SPARK_TO_AVRO[s]
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def spark_ddl_for(avro_schema: dict) -> str:
    """Spark DDL schema string for an Avro record schema."""
    cols = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(x for x in t if x != "null")
        cols.append(f"`{f['name']}` {_AVRO_TO_SPARK[t]}")
    return ", ".join(cols)


# ---------------------------------------------------------------------------
# container write
# ---------------------------------------------------------------------------


def _encode_block(rows, field_types, codec: str) -> bytes:
    data = io.BytesIO()
    for row in rows:
        for (name, typ) in field_types:
            _write_value(data, typ, row[name])
    raw = data.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(raw) + c.flush()
    return raw


def write_avro_file(
    path: str,
    avro_schema: dict,
    rows,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    block_rows: int = 4096,
) -> int:
    """Write one Avro object-container file; returns the row count.
    ``rows`` is an iterable of dicts (or Row objects supporting [name])."""
    field_types = [(f["name"], f["type"]) for f in avro_schema["fields"]]
    n_total = 0
    with open(path, "wb") as out:
        out.write(MAGIC)
        meta = io.BytesIO()
        write_long(meta, 2)
        write_bytes(meta, b"avro.schema")
        write_bytes(meta, json.dumps(avro_schema).encode("utf-8"))
        write_bytes(meta, b"avro.codec")
        write_bytes(meta, codec.encode("utf-8"))
        write_long(meta, 0)  # end of metadata map
        out.write(meta.getvalue())
        out.write(sync)
        batch: list = []

        def flush():
            nonlocal n_total
            if not batch:
                return
            payload = _encode_block(batch, field_types, codec)
            head = io.BytesIO()
            write_long(head, len(batch))
            write_long(head, len(payload))
            out.write(head.getvalue())
            out.write(payload)
            out.write(sync)
            n_total += len(batch)
            batch.clear()

        for row in rows:
            batch.append(row)
            if len(batch) >= block_rows:
                flush()
        flush()
    return n_total


def write_avro(df, path: str, codec: str = "deflate") -> None:
    """Distributed Avro sink: one container file per partition (the shape
    of Spark's own file sinks), encoded executor-side."""
    import os

    os.makedirs(path, exist_ok=True)
    schema = avro_schema_for(df.schema)
    cols = [f.name for f in df.schema.fields]

    def write_partition(idx, it):
        import uuid

        rows = ({c: r[c] for c in cols} for r in it)
        # write-then-rename commit: the attempt writes to a hidden staging
        # name and renames only on success, so a failed/retried or
        # speculative attempt never leaves a partial container in the
        # listing (readers skip dotfiles); rename is atomic on POSIX and
        # the uuid keeps concurrent attempts from colliding.
        token = uuid.uuid4().hex
        final = f"{path}/part-{idx:05d}-{token}.avro"
        staging = f"{path}/.part-{idx:05d}-{token}.avro.tmp"
        n = write_avro_file(staging, schema, rows, codec=codec)
        if n == 0:
            os.remove(staging)  # no empty containers
        else:
            os.rename(staging, final)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()


# ---------------------------------------------------------------------------
# container read
# ---------------------------------------------------------------------------


def parse_avro_container(content: bytes):
    """Decode one container's (avro_schema, rows-as-dicts)."""
    buf = io.BytesIO(content)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            read_long(buf)
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    field_types = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = buf.read(16)
    rows = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        n_rows = read_long(buf)
        payload = read_bytes(buf)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec: {codec}")
        block = io.BytesIO(payload)
        for _ in range(n_rows):
            rows.append(
                {name: _read_value(block, typ) for (name, typ) in field_types}
            )
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
    return schema, rows


def read_avro(spark, path: str):
    """Distributed Avro source: list containers as binaryFile rows, peek
    one header driver-side for the schema, decode each file executor-side
    (Arrow-batched mapInPandas)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(f"{path}/*.avro")
    one = files.select("content").limit(1).collect()
    if not one:
        raise ValueError(f"no .avro files under {path}")
    schema, _ = parse_avro_container(bytes(one[0]["content"]))
    ddl = spark_ddl_for(schema)
    names = [f["name"] for f in schema["fields"]]

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = parse_avro_container(bytes(content))
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                    if rows
                    else {n: [] for n in names}
                )

    return files.select("content").mapInPandas(decode, schema=ddl)
