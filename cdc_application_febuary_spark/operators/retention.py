"""Behavioral analytics over event/order streams: cohort retention and
RFM segmentation — the reporting shapes a CDC-fed warehouse serves daily.

Both are two-aggregation plans whose intermediate state is bounded by
ENTITIES (users, customers), not events: the raw stream collapses to one
row per entity (or per entity-period) in the first shuffle, and every
later step works on that reduced table. That is the property that holds
at 100 TB — the wide input is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix.

    (cohort_week, week_offset, active_users, cohort_size, retention_rate):
    users grouped by their first-activity week; each later week's row
    counts how many of them came back. Plan: events -> distinct
    (user, week) pairs (one shuffle, map-side combine), a min() window per
    user for the cohort (no second pass over raw events), then a count per
    (cohort, offset). The cohort-size join is a broadcast — one row per
    cohort week."""
    uw = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).alias("week"),
    ).distinct()
    w = Window.partitionBy("u")
    marked = uw.withColumn("cohort_week", F.min("week").over(w)).withColumn(
        "week_offset",
        F.datediff(F.col("week"), F.col("cohort_week")) / 7,
    )
    grid = marked.groupBy(
        "cohort_week", F.col("week_offset").cast("int").alias("week_offset")
    ).agg(F.count(F.lit(1)).alias("active_users"))
    sizes = grid.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("active_users").alias("cohort_size")
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    quantiles: int = 5,
) -> DataFrame:
    """RFM quintile segmentation rolled up to segment level.

    Per customer: recency (days since last order, against the dataset max
    date), frequency (order count), monetary (exact DECIMAL sum — double
    sums would make the quantile ordering engine-dependent). Each scored
    into ``quantiles`` exact NTILEs with the customer key as the
    tiebreaker, so the assignment is a total order and deterministic
    across engines. The scoring uses ``ranking.scalable_ntile`` — ANSI
    NTILE semantics with no single-partition window stage, so the plan
    parallelizes even when the per-customer table itself is large.
    Output: (r_score, f_score, m_score, customers, sum_monetary) — at
    most ``quantiles^3`` rows whatever the customer count."""
    from .ranking import scalable_ntile

    per_cust = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.max(F.col(date_col)).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).alias("monetary"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("__max_date"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff(F.col("__max_date"), F.col("last_order"))
    )
    scored = scalable_ntile(
        scored, quantiles, [F.asc("recency_days"), F.asc("custkey")], "r_score"
    )
    scored = scalable_ntile(
        scored, quantiles, [F.desc("frequency"), F.asc("custkey")], "f_score"
    )
    scored = scalable_ntile(
        scored, quantiles, [F.desc("monetary"), F.asc("custkey")], "m_score"
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum("monetary").cast("double").alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
