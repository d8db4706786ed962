"""Fuzzy (edit-distance) self-join — entity-resolution for name-like
columns, the string sibling of the embedding/minhash near-dup operators.

All-pairs Levenshtein is quadratic; the scale shape is block-verify:
1. block on a cheap deterministic key (caller-supplied expression — last
   token, first-N chars, phonetic code, ...) so candidates come from an
   equi-join, never a cross join;
2. pre-filter with the length-difference bound (|len(a)-len(b)| > d
   implies edit distance > d) before computing anything expensive;
3. verify candidates with exact `levenshtein` (JVM built-in, codegen'd).

Recall is bounded by the blocking key: pairs whose edits cross the key
(e.g. a typo in the blocking token) are missed — the standard
entity-resolution trade; run multiple passes with different keys for
OR-amplification, same as multi-table LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """(a, b, dist) pairs with a < b, same block key, and
    levenshtein(name_a, name_b) <= max_dist."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block.alias("blk"),
    ).repartition(parts, "blk")
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name")))
                <= max_dist
            ),
        )
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.levenshtein(F.col("a.name"), F.col("b.name"))
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def last_token(col: str | Column) -> Column:
    """Default blocking key for '<modifier> <head>' names: the head word."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(\S+)$", 1)
