"""File/object sources with schema inference; identifier/topic/status
scalar helpers."""

import json

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.identifiers import (
    normalize_status,
    sanitize_identifier,
    sanitize_identifier_py,
    table_from_topic,
    topic_name,
    translate_default,
)
from cdc_application_febuary_spark.sources.files import (
    infer_json_schema,
    infer_value_type,
    list_objects,
    read_csv_objects,
    read_json_objects,
    read_text_lines,
    write_full_load_json,
)


def test_infer_value_type_reference_rules():
    # bool must win over int (bool subclasses int in Python) — s3.py:752-776
    assert infer_value_type(True) == "boolean"
    assert infer_value_type(3) == "integer"
    assert infer_value_type(3.5) == "float"
    assert infer_value_type("x") == "string"
    assert infer_value_type({"a": 1}) == "json"
    assert infer_value_type([1]) == "array"
    assert infer_value_type(None) == "string"


def test_infer_json_schema_merging():
    lines = [
        json.dumps({"id": 1, "price": 2, "name": "a", "ok": True}),
        json.dumps({"id": 2, "price": 2.5, "name": None}),
        json.dumps({"id": "oops"}),
        "not json at all",
    ]
    schema = infer_json_schema(lines)
    assert schema["price"] == "float"   # int + float widens to float
    assert schema["id"] == "string"     # int + string widens to string
    assert schema["ok"] == "boolean"


def test_object_listing_and_readers(spark, tmp_path):
    (tmp_path / "orders.json").write_text(
        '{"id": 1, "amt": 2.5}\n{"id": 2, "amt": 3.5}\n'
    )
    (tmp_path / "customers.csv").write_text("id,name\n1,a\n2,b\n")
    (tmp_path / "notes.txt").write_text("hello\nworld\n")
    objs = list_objects(str(tmp_path))
    assert [o.table for o in objs] == ["customers", "notes", "orders"]
    assert all(o.size > 0 for o in objs)

    dj = read_json_objects(spark, str(tmp_path / "orders.json"))
    assert dj.count() == 2 and dict(dj.dtypes)["amt"] == "double"
    dc = read_csv_objects(spark, str(tmp_path / "customers.csv"))
    assert dc.columns == ["id", "name"] and dict(dc.dtypes)["id"] == "int"
    dt = read_text_lines(spark, str(tmp_path / "notes.txt"))
    assert dt.count() == 2


def test_write_full_load_json_partitioned(spark, tmp_path):
    df = spark.range(100).repartition(4)
    out = str(tmp_path / "out")
    write_full_load_json(df, out)
    back = read_json_objects(spark, out)
    assert back.count() == 100
    # partitioned output — multiple part files, not the reference's single object
    parts = [p for p in (tmp_path / "out").iterdir() if p.name.startswith("part-")]
    assert len(parts) == 4


def test_sanitize_identifier(spark):
    df = spark.createDataFrame([("my table#1 (new)",)], ["name"])
    got = df.select(sanitize_identifier("name")).collect()[0][0]
    assert got == "my_table_1_new_"
    assert sanitize_identifier_py("my table#1 (new)") == got  # twins agree


def test_topic_roundtrip(spark):
    df = spark.createDataFrame([("p1", "dbo", "orders")], ["p", "s", "t"])
    topic = df.select(topic_name("p", "s", "t").alias("topic"))
    assert topic.collect()[0]["topic"] == "p1.dbo.orders"
    assert topic.select(table_from_topic("topic")).collect()[0][0] == "orders"


def test_normalize_status(spark):
    df = spark.createDataFrame(
        [("COMPLETED",), ("applied",), ("Error",), ("running",), ("???",)], ["s"]
    )
    got = [r[0] for r in df.select(normalize_status("s")).collect()]
    assert got == ["success", "success", "failed", "pending", "unknown"]


def test_translate_default():
    assert translate_default("(getdate())") == "CURRENT_TIMESTAMP"
    assert translate_default("(NEWID())") == "gen_random_uuid()"
    assert translate_default("((0))") == "false"
    assert translate_default("((1))") == "true"
    assert translate_default("'0'::smallint") == "'0'"
    assert translate_default(None) is None
