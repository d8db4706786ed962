"""Skew-handling utilities for joins and aggregations at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit tools cover the cases AQE can't: skewed *broadcast-
ineligible* joins where one hot key floods a task, and hot-key aggregations.

Salting: replicate the small side R times, scatter the big side's hot keys
across R salt values, join on (key, salt). Two-phase aggregation: partial
aggregate on (key, salt), final aggregate on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salt_large_side(df: DataFrame, salts: int, salt_col: str = "__salt") -> DataFrame:
    """Random-uniform salt per row of the LARGE side (deterministic per row:
    hash of all columns, not rand(), so retries and replays agree)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    )


def explode_small_side(df: DataFrame, salts: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate the SMALL side once per salt value."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<long>")),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt scattering: the large side's hot keys spread over
    `salts` tasks instead of one. Output drops the salt column."""
    lg = salt_large_side(large, salts)
    sm = explode_small_side(small, salts)
    return lg.join(sm, on + ["__salt"], how).drop("__salt")


def two_phase_count(
    df: DataFrame, key_cols: list[str], salts: int = 16
) -> DataFrame:
    """Hot-key-safe count: partial count on (key, salt), final sum on key.
    Spark's hash aggregate already does partial/final internally; this
    explicit form additionally splits a single hot key's *partial* state
    across `salts` reducers."""
    salted = salt_large_side(df, salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__pc")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__pc").alias("cnt"))


def skew_report(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total for the heaviest
    keys — what you run before deciding to salt."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(total), 6))
        .orderBy(F.col("cnt").desc(), *[F.col(c) for c in key_cols])
        .limit(top)
    )


def two_phase_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without hot-key reducer state.

    A naive per-key distinct holds the hot key's whole value set in one
    reducer (the non-combinable state the skew drill's hottest-reducer
    column predicts). Phase 1 dedups on (key, value) — the shuffle key
    INCLUDES the value, so a hot key's state spreads across all reducers;
    phase 2 is a plain combinable count per key. This is the explicit form
    of the expand-based rewrite Spark applies to single countDistinct
    aggregates, usable when composing with other aggregates would force
    the planner out of it."""
    return (
        df.select(*key_cols, value_col)
        .distinct()
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("distinct_cnt"))
    )
