"""Block-verify fuzzy self-join: planted typos found, cross-block edits
missed by design, length bound never drops a true pair."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.fuzzyjoin import (
    fuzzy_self_pairs,
    last_token,
)


def _names(spark):
    rows = [
        (1, "red bolt"),
        (2, "rad bolt"),    # dist 1 from 1
        (3, "red bolts"),   # dist 1 from 1 (length diff 1), same head? no —
                            # head token differs ("bolts"), so blocked apart
        (4, "blue gear"),
        (5, "blue gear"),   # exact dup of 4
        (6, "glue gear"),   # dist 1 from 4/5
        (7, "red jolt"),    # dist 1 from 1 but different head -> missed
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_finds_planted_typos_within_block(spark):
    df = _names(spark)
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in fuzzy_self_pairs(df, "id", "name", last_token("name"), 1).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(4, 5)] == 0
    assert got[(4, 6)] == 1 and got[(5, 6)] == 1
    # cross-block edits are the documented recall trade
    assert (1, 7) not in got and (1, 3) not in got


def test_distance_bound_respected(spark):
    df = _names(spark)
    out = fuzzy_self_pairs(df, "id", "name", last_token("name"), 0).collect()
    assert {(r["a"], r["b"]) for r in out} == {(4, 5)}


def test_matches_naive_within_block(spark):
    """Against the unblocked theta join restricted to same head word,
    block-verify is exact (the length bound is a pure pre-filter)."""
    df = _names(spark)
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r["ai"], r["bi"])
        for r in a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (
                F.regexp_extract(F.col("a.name"), r"(\S+)$", 1)
                == F.regexp_extract(F.col("b.name"), r"(\S+)$", 1)
            )
            & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= 1),
        )
        .select(F.col("a.id").alias("ai"), F.col("b.id").alias("bi"))
        .collect()
    }
    got = {
        (r["a"], r["b"])
        for r in fuzzy_self_pairs(df, "id", "name", last_token("name"), 1).collect()
    }
    assert got == naive
