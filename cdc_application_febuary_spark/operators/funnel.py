"""Ordered conversion funnels: how many users performed stage_1 -> ... ->
stage_k as a strictly time-ordered sequence.

The sequential-pattern analytic (Flink MATCH_RECOGNIZE / product-analytics
funnels), expressed as pure relational algebra so Catalyst owns the
physical plan: stage i is "earliest qualifying event strictly after the
user's stage-(i-1) time", which is one filtered aggregate per stage joined
back on the user key.

Scale shape: every stage is an equi-join + partial-aggregated min on the
SAME key (user), so AQE plans k-1 shuffles over monotonically SHRINKING
sets — stage outputs are one row per surviving user, and each stage's
filter (event type + strictly-later timestamp) prunes before the shuffle.
No window over unbounded partitions, no per-user event collection: state
per user is one timestamp."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap=None,
) -> DataFrame:
    """One row per user who completed stage 1, with the earliest completion
    time of every stage reached in order (NULL once the chain breaks):
    (user, t1, t2, ..., tk).

    ``max_gap`` (same unit as ``ts_col``) time-boxes each transition: stage
    i must land within ``max_gap`` of stage i-1 — the attribution-window
    form ("purchased within 48h of the click"). The window bounds each
    stage's candidate scan as a pure predicate; no extra state."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        cond = F.col("__ts") > F.col("__prev")
        if max_gap is not None:
            cond = cond & (F.col("__ts") <= F.col("__prev") + F.lit(max_gap))
        nxt = (
            events.where(F.col(type_col) == stage)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("__ts"))
            .join(cur.select("user", F.col(f"t{i - 1}").alias("__prev")), "user")
            .where(cond)
            .groupBy("user")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    return cur


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap=None,
) -> DataFrame:
    """(stage_idx, stage, users, conversion_from_first) — users surviving
    each prefix of the ordered sequence. One funnel_times pass, one
    single-row aggregate unpivoted in-plan (no driver round-trip)."""
    k = len(stages)
    times = funnel_times(events, stages, user_col, type_col, ts_col, max_gap)
    wide = times.agg(
        *[F.count(F.col(f"t{i}")).alias(f"n{i}") for i in range(1, k + 1)]
    )
    stack_args = ", ".join(
        f"{i}, '{stages[i - 1]}', n{i}" for i in range(1, k + 1)
    )
    return wide.selectExpr(
        f"stack({k}, {stack_args}) as (stage_idx, stage, users)", "n1"
    ).select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("users").cast("bigint"),
        F.when(F.col("n1") > 0, F.round(F.col("users") / F.col("n1"), 6))
        .otherwise(F.lit(0.0))
        .alias("conversion"),
    )
