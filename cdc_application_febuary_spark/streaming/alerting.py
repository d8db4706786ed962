"""Alert-rule evaluation: a rule table applied to a metrics table.

Reference: `backend/ingestion/alerting/alert_engine.py:25-130` — per
pipeline, each enabled AlertRuleModel row (metric, condition, threshold,
severity, channels) is evaluated against the current metrics dict; a rule
whose metric is absent never fires (metrics.get -> None -> False), unknown
conditions never fire, and a fired rule yields an alert row whose message
is "{name}: {metric} ({value}) {condition} {threshold}".

Spark-first shape: the reference loops rules per pipeline driver-side; at
scale the rules table is a small dimension and the metrics table is the
fact, so evaluation is one broadcast inner join on (pipeline_id, metric)
plus a CASE filter — no UDFs, fully codegen'd, and the absent-metric /
disabled-rule / unknown-condition semantics fall out of the join + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RULE_COLS = (
    "rule_id",
    "rule_name",
    "pipeline_id",
    "metric",
    "condition",
    "threshold",
    "severity",
    "enabled",
)

#: Conditions the reference understands (alert_engine.py:86-96); anything
#: else logs a warning and never fires.
CONDITIONS = ("greater_than", "less_than", "equals", "not_equals")


def rule_fires(value, condition, threshold) -> F.Column:
    """True iff the reference's _evaluate_rule would return True.

    NULL value (absent metric) yields NULL -> filtered out, matching the
    reference's early `return False` for missing metrics."""
    v = F.col(value) if isinstance(value, str) else value
    c = F.col(condition) if isinstance(condition, str) else condition
    t = F.col(threshold) if isinstance(threshold, str) else threshold
    return (
        F.when(c == "greater_than", v > t)
        .when(c == "less_than", v < t)
        .when(c == "equals", v == t)
        .when(c == "not_equals", v != t)
        .otherwise(F.lit(False))
    )


def evaluate_rules(rules: DataFrame, metrics: DataFrame) -> DataFrame:
    """Fired alerts: enabled rules joined to their pipeline's metric value,
    kept where the condition holds.

    ``rules``: RULE_COLS shape (thresholds and metric values are integral
    in our metrics tables — counters, bytes, row counts — so the message
    renders identically across engines).
    ``metrics``: (pipeline_id, metric, value).

    The rules side is broadcast (an alert-rule table is human-authored —
    thousands of rows at most); the metrics fact streams past it map-side,
    so evaluation adds no shuffle at any scale.
    """
    r = F.broadcast(rules.where(F.col("enabled")))
    joined = r.join(metrics, ["pipeline_id", "metric"], "inner")
    fired = joined.where(rule_fires("value", "condition", "threshold"))
    return fired.select(
        "rule_id",
        "rule_name",
        "pipeline_id",
        "severity",
        "metric",
        F.col("value").alias("metric_value"),
        "threshold",
        "condition",
        F.concat(
            F.col("rule_name"),
            F.lit(": "),
            F.col("metric"),
            F.lit(" ("),
            F.col("value").cast("string"),
            F.lit(") "),
            F.col("condition"),
            F.lit(" "),
            F.col("threshold").cast("string"),
        ).alias("message"),
        F.lit("active").alias("status"),
    )


def batch_metrics(batch_df: DataFrame, pipeline_id: str) -> DataFrame:
    """Per-micro-batch metrics in the (pipeline_id, metric, value) shape
    `evaluate_rules` consumes: row count, distinct keys if a key column
    exists, and delete-op count when the batch carries ``__op`` — the
    counters the reference's metrics collector snapshots per batch."""
    aggs = [F.count(F.lit(1)).alias("events_total")]
    if "__op" in batch_df.columns:
        aggs.append(
            F.count(F.when(F.lower("__op") == "d", 1)).alias("deletes_total")
        )
    row = batch_df.agg(*aggs)
    names = [f.name for f in row.schema.fields]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return row.selectExpr(
        f"stack({len(names)}, {stack}) AS (metric, value)"
    ).select(F.lit(pipeline_id).alias("pipeline_id"), "metric", "value")


def alert_history_sink(rules: DataFrame, history_path: str, pipeline_id: str):
    """foreachBatch hook: evaluate the rule table against each
    micro-batch's metrics and append fired alerts (stamped with batch_id)
    to a parquet history — the streaming form of the reference's
    check_alerts + _store_alert loop (alert_engine.py:25-160, which runs
    per metrics snapshot and inserts AlertHistoryModel rows).

    Append-only + batch_id stamping keeps replays auditable: a restarted
    batch re-fires the same alerts with the same batch_id, and readers
    dedupe on (batch_id, rule_id) — alerting is notification, not state,
    so exactly-once delivery is explicitly NOT promised (same trade the
    reference makes by writing history before delivery)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        fired = evaluate_rules(rules, batch_metrics(batch_df, pipeline_id))
        (
            fired.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(history_path)
        )

    return hook


def alert_counts_by_severity(alerts: DataFrame) -> DataFrame:
    """History rollup (alert_engine.py stores every fired alert): fired
    alerts per pipeline and severity — the dashboard tile shape."""
    return (
        alerts.groupBy("pipeline_id", "severity")
        .agg(F.count(F.lit(1)).alias("alerts"))
        .orderBy("pipeline_id", "severity")
    )
