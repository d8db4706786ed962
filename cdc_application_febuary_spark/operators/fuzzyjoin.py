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


def _jaro_winkler(a: str, b: str) -> float:
    """Standard Jaro-Winkler (Winkler boost iff jaro > 0.7, prefix <= 4,
    scale 0.1) — semantics pinned against DuckDB's
    jaro_winkler_similarity by tests/test_jaro_winkler.py."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB: both-empty scores 0, not 1
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    matched_b = [False] * lb
    ma = []
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not matched_b[j] and b[j] == ch:
                matched_b[j] = True
                ma.append((i, j))
                break
    m = len(ma)
    if m == 0:
        return 0.0
    # transpositions: matched chars of a vs matched chars of b in order
    bs = [b[j] for j in sorted(j for _, j in ma)]
    # DuckDB floors the half-count (pairs of swapped chars), so an odd
    # mismatch count rounds down — pinned by the parity tests
    t = sum(1 for (i, _), bc in zip(ma, bs) if a[i] != bc) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


def jaro_winkler_udf():
    """Arrow-batched pair scorer: jaro_winkler(a, b) -> double. Python per
    pair, but only ever applied AFTER blocking — the verify stage of a
    block-verify join, where candidate volume is already bounded."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def jw(a, b):
        return pd.Series(
            [
                _jaro_winkler(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    jw.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(jw, "double")


def jaro_winkler_self_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    min_sim: float = 0.9,
) -> DataFrame:
    """(a, b, jw) pairs with a < b, same block key, jaro_winkler >= min_sim.
    Same block-verify shape as the levenshtein join; JW tolerates
    length-divergent variants (prefix-weighted), so no length pre-filter."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block.alias("blk"),
    ).repartition(parts, "blk")
    a, b = side.alias("a"), side.alias("b")
    jw = jaro_winkler_udf()
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.round(jw(F.col("a.name"), F.col("b.name")), 6).alias("jw"),
        )
        .where(F.col("jw") >= min_sim)
    )
