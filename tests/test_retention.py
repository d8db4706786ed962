"""Cohort retention matrix and RFM segmentation."""

import datetime as dt

import pytest

from cdc_application_febuary_spark.operators import retention


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_cohort_retention_counts_and_rates(spark):
    base = dt.datetime(2024, 1, 1)  # a Monday -> week starts align
    wk = dt.timedelta(days=7)
    rows = [
        # cohort week 0: users 1,2,3; user 1 returns wk1+wk2, user 2 wk1
        (1, base), (1, base + wk), (1, base + 2 * wk),
        (2, base + dt.timedelta(days=3)), (2, base + wk),
        (3, base),
        # cohort week 1: user 4 only
        (4, base + wk + dt.timedelta(days=2)),
    ]
    out = {
        (r["cohort_week"], r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_rate"],
        )
        for r in retention.cohort_retention(_ev(spark, rows)).collect()
    }
    w0, w1 = base, base + wk
    assert out[(w0, 0)] == (3, 3, 1.0)
    assert out[(w0, 1)] == (2, 3, pytest.approx(0.666667))
    assert out[(w0, 2)] == (1, 3, pytest.approx(0.333333))
    assert out[(w1, 0)] == (1, 1, 1.0)
    assert (w1, 1) not in out
    # a user active twice in one week counts once
    assert len(out) == 4


def _orders(spark):
    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for c in range(20):
        # customer c: c+1 orders, latest at day c, each worth 100+c
        for j in range(c + 1):
            rows.append((c * 100 + j, c, d0 + dt.timedelta(days=c - j), 100.0 + c))
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_rfm_scores_match_ansi_ntile_reference(spark):
    """The scalable-ntile scoring must equal a plain global-window NTILE
    reference computed over the identical per-customer table."""
    from pyspark.sql import Window, functions as F

    orders = _orders(spark)
    got = retention.rfm_segments(orders, quantiles=4).collect()

    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("__max_date"))
    ref = (
        per_cust.crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("__max_date", "last_order"))
        .withColumn(
            "r_score",
            F.ntile(4).over(Window.orderBy(F.asc("recency_days"), F.asc("custkey"))).cast("bigint"),
        )
        .withColumn(
            "f_score",
            F.ntile(4).over(Window.orderBy(F.desc("frequency"), F.asc("custkey"))).cast("bigint"),
        )
        .withColumn(
            "m_score",
            F.ntile(4).over(Window.orderBy(F.desc("monetary"), F.asc("custkey"))).cast("bigint"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum("monetary").cast("double").alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in ref]
    # sanity: most orders+recent customer is in the best segment everywhere
    best = [r for r in got if (r["r_score"], r["f_score"], r["m_score"]) == (1, 1, 1)]
    assert best and best[0]["customers"] >= 1
