"""Scalar helpers: text analysis expressions and LSN parse/format."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.lsn import (
    long_to_pg_lsn,
    pg_lsn_to_long,
    sqlserver_lsn_to_long,
)
from cdc_application_febuary_spark.functions import text as T


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  x ",), ("",)], ["text"]
    )
    got = [r[0] for r in df.select(T.token_count("text")).collect()]
    assert got == [3, 1, 0]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d e f",)], ["text"])
    got = df.select(T.word_shingles("text", 5).alias("s")).collect()[0]["s"]
    assert got == ["a b c d e", "b c d e f"]
    short = spark.createDataFrame([("a b",)], ["text"])
    assert short.select(T.word_shingles("text", 5).alias("s")).collect()[0]["s"] == []


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of a house",),
            ("der hund und die katze ist gut",),
            ("le chat et les chiens des maisons",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(T.lang_id("text")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("word " * 60,), ("!!!",), ("the the the",)], ["text"]
    )
    vals = [r[0] for r in df.select(T.quality_score("text")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # long clean text beats pure punctuation


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["text"]
    )
    fps = [r[0] for r in df.select(T.fingerprint("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_pg_lsn_roundtrip_known_value(spark):
    # 16/B374D848 = (0x16 << 32) | 0xB374D848
    expected = (0x16 << 32) | 0xB374D848
    got = _one(spark, pg_lsn_to_long(F.lit("16/B374D848")))
    assert got == expected
    back = _one(spark, long_to_pg_lsn(F.lit(expected).cast("long")))
    assert back == "16/B374D848"


def test_pg_lsn_gap_ordering(spark):
    a = _one(spark, pg_lsn_to_long(F.lit("0/FFFFFFFF")))
    b = _one(spark, pg_lsn_to_long(F.lit("1/0")))
    assert b == a + 1


def test_sqlserver_lsn_orderable(spark):
    lo = _one(spark, sqlserver_lsn_to_long(F.lit("00000025:00000448:0001")))
    hi = _one(spark, sqlserver_lsn_to_long(F.lit("00000025:00000448:0002")))
    hi2 = _one(spark, sqlserver_lsn_to_long(F.lit("00000026:00000000:0000")))
    assert lo < hi < hi2
