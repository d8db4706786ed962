"""Driver-query lifecycles for the stream x stream join and in-stream
dedup queries (`queries/pipeline_ops.py:stream_stream_attribution` /
`stream_dedup_report`): both run REAL multi-batch streams at build time;
these tests pin the semantic invariants the DuckDB oracle hash also
enforces, at the small fixture scale where pytest stays fast.
"""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.queries.pipeline_ops import (
    stream_dedup_report,
    stream_stream_attribution,
)


def test_stream_stream_attribution_matches_batch_interval_join(spark, sf_dir):
    """Emitted pairs == the batch interval join: same per-user counts and
    exact integer gap sums; every gap within [0, 6h]."""
    from cdc_application_febuary_spark.catalog import load_table

    got = stream_stream_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts")
    )
    batch = (
        clicks.join(
            buys,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("buy_ts") >= F.col("click_ts"))
            & (
                F.col("buy_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                F.unix_micros("buy_ts") - F.unix_micros("click_ts")
            ).alias("sum_gap_us"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in batch]
    assert all(
        0 <= r["sum_gap_us"] <= r["pairs"] * 6 * 3600 * 1_000_000
        for r in got
    )


def test_stream_dedup_report_drops_planted_duplicates(spark, sf_dir):
    """Post-dedup counts equal the original feed's distinct counts —
    n_rows == n_keys per type, and the totals match the raw table."""
    from cdc_application_febuary_spark.catalog import load_table

    rows = stream_dedup_report(spark, sf_dir).collect()
    assert rows, "dedup stream produced no output"
    assert all(r["n_rows"] == r["n_keys"] for r in rows)
    truth = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["event_type"]: r["n_rows"] for r in rows} == truth


def test_stream_stream_left_outer_matches_batch(spark, sf_dir):
    """Watermark-finalized null emission equals the batch LEFT JOIN:
    same per-user row/matched/unmatched counts and exact gap sums."""
    from cdc_application_febuary_spark.catalog import load_table
    from cdc_application_febuary_spark.queries.pipeline_ops import (
        stream_stream_left_outer,
    )

    got = {r["user_id"]: r.asDict() for r in
           stream_stream_left_outer(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts")
    )
    batch = (
        clicks.join(
            buys,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("buy_ts") >= F.col("click_ts"))
            & (
                F.col("buy_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")
            ),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("buy_ts").alias("n_matched"),
            F.sum(F.col("buy_ts").isNull().cast("bigint")).alias(
                "n_unmatched"
            ),
            F.coalesce(
                F.sum(
                    F.unix_micros("buy_ts") - F.unix_micros("click_ts")
                ),
                F.lit(0),
            ).alias("sum_gap_us"),
        )
        .collect()
    )
    expect = {r["user_id"]: r.asDict() for r in batch}
    assert got == expect
    assert any(r["n_unmatched"] > 0 for r in got.values())
