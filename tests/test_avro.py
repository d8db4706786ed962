"""Pure-Python Avro object-container format (functions/avro.py): binary
encoding, container framing, codecs, and the distributed write/read paths."""

import io

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions import avro as A


def test_zigzag_varint_roundtrip():
    buf = io.BytesIO()
    values = [0, -1, 1, -2, 2, 63, 64, -64, -65, 2**40, -(2**40), 2**62]
    for v in values:
        A.write_long(buf, v)
    buf.seek(0)
    assert [A.read_long(buf) for _ in values] == values


def test_zigzag_known_bytes():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    def enc(n):
        b = io.BytesIO()
        A.write_long(b, n)
        return b.getvalue()

    assert enc(0) == b"\x00"
    assert enc(-1) == b"\x01"
    assert enc(1) == b"\x02"
    assert enc(-2) == b"\x03"
    assert enc(2) == b"\x04"
    assert enc(-64) == b"\x7f"
    assert enc(64) == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_single_file(tmp_path, codec):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "x", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "boolean"},
            {"name": "opt", "type": ["null", "long"]},
        ],
    }
    rows = [
        {"k": i, "x": i / 8.0, "s": f"s{i}é", "b": i % 2 == 0,
         "opt": None if i % 3 == 0 else i * 7}
        for i in range(-5, 2000)  # spans multiple varint widths + 1 block
    ]
    p = str(tmp_path / "t.avro")
    n = A.write_avro_file(p, schema, rows, codec=codec, block_rows=256)
    assert n == len(rows)
    got_schema, got = A.parse_avro_container(open(p, "rb").read())
    assert got_schema == schema
    assert got == rows


def test_magic_and_sync_validation(tmp_path):
    with pytest.raises(ValueError, match="not an Avro"):
        A.parse_avro_container(b"PAR1" + b"\x00" * 32)
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "k", "type": "long"}]}
    p = str(tmp_path / "t.avro")
    A.write_avro_file(p, schema, [{"k": 1}])
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        A.parse_avro_container(bytes(blob))


def test_schema_mapping_spark_avro_spark(spark):
    df = spark.range(3).select(
        F.col("id").alias("k"),                      # non-nullable -> plain
        (F.col("id") * 1.5).alias("x"),
        F.when(F.col("id") > 0, "a").alias("s"),     # nullable -> union
    )
    avsc = A.avro_schema_for(df.schema)
    assert [f["type"] for f in avsc["fields"]] == [
        "long", "double", ["null", "string"]
    ]
    assert A.spark_ddl_for(avsc) == "`k` long, `x` double, `s` string"


def test_distributed_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "avro_dir")
    df = spark.range(0, 1000, 1, 4).select(
        F.col("id").alias("k"),
        (F.col("id") / 4.0).alias("x"),
        F.concat(F.lit("row"), F.col("id")).alias("s"),
        F.when(F.col("id") % 5 != 0, F.col("id") * 2).alias("opt"),
    )
    A.write_avro(df, out, codec="deflate")
    back = A.read_avro(spark, out)
    assert back.schema.simpleString() == df.schema.simpleString()
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    # multiple container files were produced (one per partition)
    import pathlib

    parts = list(pathlib.Path(out).glob("*.avro"))
    assert len(parts) == 4
