"""Jaro-Winkler parity with DuckDB (the oracle engine) and join semantics."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.fuzzyjoin import (
    _jaro_winkler,
    jaro_winkler_self_pairs,
    last_token,
)

KNOWN = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("abcvwxyz", "abcdefgh"),  # jaro <= 0.7: boost must NOT apply
    ("aaaa", "aa"),
    ("abcd", "abce"),
    ("ab", "ab"),
    ("a", ""),
    ("", ""),
    ("abc", "acb"),
]


@pytest.mark.parametrize("a,b", KNOWN)
def test_known_cases_match_duckdb(a, b):
    expect = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert _jaro_winkler(a, b) == pytest.approx(expect, abs=1e-12)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    a=st.text(alphabet="abcdef ", max_size=12),
    b=st.text(alphabet="abcdef ", max_size=12),
)
def test_random_strings_match_duckdb(a, b):
    expect = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert _jaro_winkler(a, b) == pytest.approx(expect, abs=1e-12)


def test_self_pairs_blocked_join(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acmee corp"),   # near-dup, same block (corp)
            (3, "acme inc"),     # different block
            (4, "zzzzz corp"),   # same block, dissimilar
        ],
        "id long, name string",
    )
    pairs = jaro_winkler_self_pairs(
        df, "id", "name", last_token("name"), min_sim=0.9
    ).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jw"] >= 0.9
