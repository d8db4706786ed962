"""PII redaction: category coverage, precedence, idempotence, counts."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions import text as T


def _one(spark, s, expr):
    return (
        spark.createDataFrame([(s,)], "text string")
        .select(expr.alias("out"))
        .first()["out"]
    )


def test_each_category_redacts(spark):
    cases = {
        "mail bob.smith+x@example.co.uk now": "mail <EMAIL> now",
        "host 192.168.0.1 up": "host <IP> up",
        "call 555-123-4567 today": "call <PHONE> today",
        "ssn 123-45-6789 leaked": "ssn <SSN> leaked",
    }
    for src, want in cases.items():
        assert _one(spark, src, T.redact_pii("text")) == want


def test_ssn_beats_phone_precedence(spark):
    # 3-2-4 digit groups are SSNs, not phones
    assert _one(spark, "id 987-65-4321", T.redact_pii("text")) == "id <SSN>"


def test_redaction_idempotent(spark):
    s = "a@b.co 10.0.0.1 555-123-4567 123-45-6789"
    once = _one(spark, s, T.redact_pii("text"))
    twice = _one(spark, once, T.redact_pii("text"))
    assert once == twice == "<EMAIL> <IP> <PHONE> <SSN>"


def test_clean_text_untouched(spark):
    s = "version 1.2 released on 2024-01-01 for 3.5 users"
    assert _one(spark, s, T.redact_pii("text")) == s


def test_counts_match_redactions(spark):
    s = "a@b.co and c@d.io from 10.0.0.1; call 555-123-4567 or 555-987-6543"
    df = spark.createDataFrame([(s,)], "text string")
    row = df.select(
        T.pii_count("text", "email").alias("e"),
        T.pii_count("text", "ipv4").alias("i"),
        T.pii_count("text", "phone").alias("p"),
        T.pii_count("text", "ssn").alias("s"),
    ).first()
    assert (row["e"], row["i"], row["p"], row["s"]) == (2, 1, 2, 0)


# --- web-text normalization (same regex-tier family as PII) ---------------

def test_strip_html_tags_and_entities(spark):
    s = "<div class='x'>Hello &amp; welcome<br/>to   <b>Spark</b>&nbsp;!</div>"
    assert _one(spark, s, T.strip_html("text")) == "Hello & welcome to Spark !"


def test_strip_html_no_double_unescape(spark):
    # '&lt;b&gt;' must surface as literal '<b>', not be re-stripped
    s = "code: &lt;b&gt;bold&lt;/b&gt;"
    assert _one(spark, s, T.strip_html("text")) == "code: <b>bold</b>"


def test_strip_html_plain_text_untouched(spark):
    s = "already clean text"
    assert _one(spark, s, T.strip_html("text")) == s
