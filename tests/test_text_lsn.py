"""Scalar helpers: text analysis expressions and LSN parse/format."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.lsn import (
    as400_journal_library,
    as400_journal_to_long,
    long_to_as400_journal,
    long_to_oracle_scn,
    long_to_pg_lsn,
    long_to_sqlserver_lsn,
    offset_to_long,
    oracle_scn_to_long,
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


def test_sqlserver_lsn_roundtrip(spark):
    v = (0x25 << 48) | (0x448 << 16) | 0x2
    s = _one(spark, long_to_sqlserver_lsn(F.lit(v).cast("long")))
    assert s == "25:448:2"
    assert _one(spark, sqlserver_lsn_to_long(F.lit(s))) == v


def test_oracle_scn_roundtrip_and_malformed(spark):
    # reference emits f"SCN:{current_scn}" (connectors/oracle.py:203-263)
    assert _one(spark, oracle_scn_to_long(F.lit("SCN:274056831"))) == 274056831
    assert _one(
        spark, long_to_oracle_scn(F.lit(274056831).cast("long"))
    ) == "SCN:274056831"
    # ordering is integer ordering
    assert _one(spark, oracle_scn_to_long(F.lit("SCN:99"))) < _one(
        spark, oracle_scn_to_long(F.lit("SCN:100"))
    )
    # malformed -> NULL (the reference yields lsn=None on failure)
    for bad in ("274056831", "SCN:", "SCN:12x", "LSN:5"):
        assert _one(spark, oracle_scn_to_long(F.lit(bad))) is None


def test_as400_journal_roundtrip_and_malformed(spark):
    # reference emits f"JOURNAL:{library}:{utcnow().isoformat()}"
    # (connectors/as400.py:747-844); orderable long = epoch micros (UTC)
    s = "JOURNAL:QSYS:2023-11-14T22:13:20.000123"
    v = _one(spark, as400_journal_to_long(F.lit(s)))
    assert v == 1700000000000123
    assert _one(spark, as400_journal_library(F.lit(s))) == "QSYS"
    back = _one(spark, long_to_as400_journal(F.lit(v).cast("long"), "QSYS"))
    assert back == s
    # later timestamp -> larger long (the lag ordering contract)
    later = "JOURNAL:QSYS:2023-11-14T22:13:21.000000"
    assert _one(spark, as400_journal_to_long(F.lit(later))) > v
    for bad in ("JOURNAL:QSYS", "2023-11-14T22:13:20", "JRN:Q:2023-01-01T00:00:00"):
        assert _one(spark, as400_journal_to_long(F.lit(bad))) is None


def test_offset_to_long_dispatch(spark):
    df = spark.createDataFrame(
        [
            ("postgresql", "1/0"),
            ("sqlserver", "1:0:0"),
            ("oracle", "SCN:42"),
            ("as400", "JOURNAL:JRNLIB:2023-11-14T22:13:20.000000"),
            ("mysql", "binlog.000001:4"),  # unknown engine -> NULL
        ],
        ["engine", "offset_str"],
    )
    got = {
        r["engine"]: r["v"]
        for r in df.select(
            "engine", offset_to_long("offset_str", "engine").alias("v")
        ).collect()
    }
    assert got["postgresql"] == 1 << 32
    assert got["sqlserver"] == 1 << 48
    assert got["oracle"] == 42
    assert got["as400"] == 1700000000000000
    assert got["mysql"] is None
