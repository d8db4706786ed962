"""Round-5 integration queries: driver-visible (oracle-paired) evidence for
§2 rows that previously rested on pytest alone — alert-rule evaluation,
A12 consumer lag, J3 FK lineage + dependency validation, F9 type
inference — plus the connected-pipeline and object-store lifecycles.

Same contract as ``pipeline_ops``: thin adapters over library operators,
each paired with a DuckDB oracle when SQL-expressible. Numeric outputs
follow CLAUDE.md: integral counters cast BIGINT on both sides, no DECIMAL
in driver-visible columns, no ROUNDed double divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# ---------------------------------------------------------------------------
# Alert-rule evaluation (reference alert_engine.py:25-130)
# ---------------------------------------------------------------------------
# Metrics are integral per-pipeline counters derived from events (each
# event_type plays a pipeline); the rule table is a constant dimension
# covering all four reference conditions plus the never-fire paths
# (disabled rule, absent metric, unknown condition).
_ALERT_RULES = [
    # (rule_id, rule_name, pipeline_id, metric, condition, threshold,
    #  severity, enabled)
    (1, "high_click_volume", "click", "events_total", "greater_than", 2000, "warning", True),
    (2, "purchase_drought", "purchase", "events_total", "less_than", 2000, "info", True),
    (3, "view_user_census", "view", "distinct_users", "equals", 150, "info", True),
    (4, "signup_user_drift", "signup", "distinct_users", "not_equals", 150, "critical", True),
    (5, "error_burst", "error", "events_total", "greater_than", 2000, "critical", True),
    (6, "disabled_probe", "click", "events_total", "greater_than", 0, "info", False),
    (7, "latency_ceiling", "click", "p99_latency_ms", "greater_than", 10, "warning", True),
    (8, "regex_rule_unsupported", "view", "events_total", "matches_regex", 0, "warning", True),
    (9, "signup_value_cap", "signup", "max_value_floor", "greater_than", 300, "warning", True),
]

_ALERT_RULES_SQL = ",".join(
    f"({rid},'{name}','{pid}','{metric}','{cond}',{thr},'{sev}',{str(en).lower()})"
    for (rid, name, pid, metric, cond, thr, sev, en) in _ALERT_RULES
)

_ALERT_ORACLE = f"""
WITH metrics AS MATERIALIZED (
  SELECT event_type AS pipeline_id, 'events_total' AS metric,
         CAST(COUNT(*) AS BIGINT) AS value
  FROM events GROUP BY 1
  UNION ALL
  SELECT event_type, 'distinct_users', CAST(COUNT(DISTINCT user_id) AS BIGINT)
  FROM events GROUP BY 1
  UNION ALL
  SELECT event_type, 'max_value_floor', CAST(MAX(FLOOR(value)) AS BIGINT)
  FROM events GROUP BY 1
),
rules(rule_id, rule_name, pipeline_id, metric, condition, threshold,
      severity, enabled) AS (VALUES {_ALERT_RULES_SQL}),
fired AS (
  SELECT r.*, m.value
  FROM rules r JOIN metrics m USING (pipeline_id, metric)
  WHERE r.enabled AND
        CASE r.condition
          WHEN 'greater_than' THEN m.value > r.threshold
          WHEN 'less_than'    THEN m.value < r.threshold
          WHEN 'equals'       THEN m.value = r.threshold
          WHEN 'not_equals'   THEN m.value <> r.threshold
          ELSE FALSE END
)
SELECT CAST(rule_id AS BIGINT) AS rule_id, rule_name, pipeline_id, severity,
       metric, value AS metric_value, CAST(threshold AS BIGINT) AS threshold,
       condition,
       rule_name || ': ' || metric || ' (' || CAST(value AS VARCHAR) || ') '
         || condition || ' ' || CAST(threshold AS VARCHAR) AS message,
       'active' AS status
FROM fired ORDER BY rule_id
"""


@_q("alert_rules_fired", _ALERT_ORACLE)
def alert_rules_fired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-rule evaluation (`streaming/alerting.py`, reference
    alert_engine.py:25-130): enabled rules broadcast-joined to per-pipeline
    metrics, fired where the condition holds. Exercises all four reference
    conditions plus the never-fire paths — disabled rule, absent metric,
    unknown condition — and the reference's message format."""
    from ..streaming.alerting import evaluate_rules

    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy(F.col("event_type").alias("pipeline_id")).agg(
        F.count(F.lit(1)).alias("events_total"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.max(F.floor("value")).alias("max_value_floor"),
    )
    metrics = base.selectExpr(
        "pipeline_id",
        "stack(3, 'events_total', events_total,"
        " 'distinct_users', distinct_users,"
        " 'max_value_floor', max_value_floor) AS (metric, value)",
    )
    rules = spark.createDataFrame(
        _ALERT_RULES,
        "rule_id long, rule_name string, pipeline_id string, metric string,"
        " condition string, threshold long, severity string, enabled boolean",
    )
    return evaluate_rules(rules, metrics).orderBy("rule_id")


# ---------------------------------------------------------------------------
# A12 consumer lag (streaming/lag.py, reference monitoring.py:41-134)
# ---------------------------------------------------------------------------
# Deterministic offsets fixture from events: one consumer group per
# event_type, 4 partitions (user_id % 4), end offset = partition row count,
# committed offset = rows whose event_id clears a per-type modulus (so the
# three health buckets all appear at a 1 event/sec drain rate), and the
# user_id%4==3 partition over-commits by 5 to exercise the floor-at-0 rule.
_LAG_ORACLE = """
WITH offsets AS MATERIALIZED (
  SELECT 'cdc-' || event_type AS group_id,
         CAST(COUNT(*) AS BIGINT) AS end_offset,
         CAST(COUNT(*) FILTER (WHERE event_id %
               CASE event_type WHEN 'error' THEN 2
                               WHEN 'purchase' THEN 20
                               ELSE 100 END <> 0) AS BIGINT)
           + CASE WHEN user_id % 4 = 3 THEN 5 ELSE 0 END AS committed_offset
  FROM events GROUP BY event_type, user_id % 4
),
lags AS (
  SELECT group_id,
         GREATEST(end_offset - committed_offset, 0) AS lag
  FROM offsets
),
g AS (
  SELECT group_id, CAST(SUM(lag) AS BIGINT) AS total_lag,
         CAST(COUNT(*) AS BIGINT) AS partitions,
         CAST(MAX(lag) AS BIGINT) AS max_partition_lag
  FROM lags GROUP BY 1
)
SELECT group_id, total_lag, partitions, max_partition_lag,
       CASE WHEN total_lag / 1.0 < 60 THEN 'normal'
            WHEN total_lag / 1.0 < 300 THEN 'warning'
            ELSE 'critical' END AS health
FROM g ORDER BY group_id
"""


@_q("consumer_lag_report", _LAG_ORACLE)
def consumer_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 driver-visible: `streaming/lag.group_lag` over a deterministic
    per-(group, partition) offsets snapshot — per consumer group total lag,
    partition count, max single-partition lag, and the reference health
    bucket at a 1 event/sec drain rate (lag_monitor.py:83 thresholds).
    One partition per group over-commits to pin the floor-at-0 rule."""
    from ..streaming.lag import group_lag
    from ..streaming.monitoring import lag_health

    ev = load_table(spark, sf_dir, "events")
    modulus = (
        F.when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 20)
        .otherwise(100)
    )
    offsets = (
        ev.groupBy(
            F.col("event_type"), (F.col("user_id") % 4).alias("pid")
        )
        .agg(
            F.count(F.lit(1)).alias("end_offset"),
            (
                F.count(F.when(F.col("event_id") % modulus != 0, 1))
                + F.when(F.col("pid") % 4 == 3, 5).otherwise(0)
            ).alias("committed_offset"),
        )
        .select(
            F.concat(F.lit("cdc-"), F.col("event_type")).alias("group_id"),
            F.concat(F.lit("server1.public."), F.col("event_type")).alias(
                "topic"
            ),
            F.col("pid").alias("partition"),
            "committed_offset",
            "end_offset",
        )
    )
    g = group_lag(offsets)
    return g.select(
        "group_id",
        "total_lag",
        "partitions",
        "max_partition_lag",
        lag_health(F.col("total_lag") / F.lit(1.0)).alias("health"),
    ).orderBy("group_id")


# ---------------------------------------------------------------------------
# J3 FK lineage + J6 traversal + dependency validation (operators/lineage.py)
# ---------------------------------------------------------------------------
# Catalog fixture in the SQL Server shape the reference reads
# (sys.foreign_keys ⨝ sys.foreign_key_columns): the TPC-H FK graph.
_FK_EDGES = [
    (1, "fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    (2, "fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    (3, "fk_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    (4, "fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    (5, "fk_customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    (6, "fk_supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    (7, "fk_nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_EDGES_SQL = ",".join(
    f"('{src}','{dst}')" for (_, _, src, _, dst, _) in _FK_EDGES
)

_FK_ORACLE = f"""
WITH RECURSIVE
edges(from_table, to_table) AS MATERIALIZED (VALUES {_FK_EDGES_SQL}),
reach(table_name, hops) AS (
  SELECT 'lineitem', 0
  UNION ALL
  SELECT e.to_table, r.hops + 1
  FROM reach r JOIN edges e ON e.from_table = r.table_name
  WHERE r.hops < 10
),
minreach AS (
  SELECT table_name, CAST(MIN(hops) AS BIGINT) AS hops
  FROM reach GROUP BY 1
),
sel(table_name) AS (VALUES ('lineitem'), ('orders')),
missing AS (
  SELECT DISTINCT e.to_table AS table_name
  FROM edges e JOIN sel s ON e.from_table = s.table_name
  WHERE e.to_table NOT IN (SELECT table_name FROM sel)
)
SELECT 'reachable' AS kind, table_name, hops FROM minreach
UNION ALL
SELECT 'missing_dependency', table_name, CAST(-1 AS BIGINT) FROM missing
ORDER BY kind, table_name
"""


@_q("fk_lineage_report", _FK_ORACLE)
def fk_lineage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+J6 driver-visible: FK edges extracted from a SQL-Server-shaped
    catalog fixture (`lineage.fk_edges_from_catalog`), BFS reachability
    from lineitem with hop distances (`lineage.reachable_tables`), and the
    referential-integrity validation set (`lineage.missing_dependencies`
    for a {{lineitem, orders}} selection — the tables a pipeline must also
    replicate). The oracle walks the same graph with a recursive CTE."""
    from ..operators.lineage import (
        fk_edges_from_catalog,
        missing_dependencies,
        reachable_tables,
    )

    fk = spark.createDataFrame(
        [(rid, name) for (rid, name, *_rest) in _FK_EDGES],
        "object_id long, name string",
    )
    fkc = spark.createDataFrame(
        [
            (rid, src, scol, dst, dcol)
            for (rid, _name, src, scol, dst, dcol) in _FK_EDGES
        ],
        "constraint_object_id long, parent_table string,"
        " parent_column string, referenced_table string,"
        " referenced_column string",
    )
    edges = fk_edges_from_catalog(fk, fkc)
    reach = reachable_tables(edges, ["lineitem"]).select(
        F.lit("reachable").alias("kind"),
        F.col("table").alias("table_name"),
        F.col("hops").cast("long").alias("hops"),
    )
    missing = missing_dependencies(edges, ["lineitem", "orders"]).select(
        F.lit("missing_dependency").alias("kind"),
        F.col("table").alias("table_name"),
        F.lit(-1).cast("long").alias("hops"),
    )
    return reach.unionByName(missing).orderBy("kind", "table_name")


# ---------------------------------------------------------------------------
# F9 type inference (sources/files.py, reference s3.py:635-776)
# ---------------------------------------------------------------------------
# A planted JSON-lines object with every inference rule: bool-before-int,
# float, string, dict->json, list->array, null->string, int+float widening
# to float, and null+int conflict widening to string. Expected results are
# deterministic given the construction, so the oracle pins them as VALUES;
# the Spark column additionally records what Spark's own sampled inference
# yields for the same object (bigint/double/struct/array — and null+int
# resolving to bigint because JSON nulls don't widen Spark's inference).
_INFER_ORACLE = """
SELECT * FROM (VALUES
  ('amount',  'float',   'double'),
  ('flag',    'boolean', 'boolean'),
  ('maybe',   'string',  'bigint'),
  ('meta',    'json',    'struct<clerk:string>'),
  ('mixed',   'float',   'double'),
  ('okey',    'integer', 'bigint'),
  ('status',  'string',  'string'),
  ('tags',    'array',   'array<string>')
) t(column_name, value_rule_type, spark_inferred_type)
ORDER BY column_name
"""


@_q("type_inference_report", _INFER_ORACLE)
def type_inference_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 driver-visible: value-based schema inference
    (`files.infer_json_schema`, reference s3.py:635-776 rules) over a
    planted JSON object derived from orders, side by side with Spark's own
    sampled inference on the same bytes. Covers bool-before-int, dict/list
    mapping, int+float widening, and the null+int conflict (the reference
    rule widens to string; Spark's inference ignores nulls -> bigint)."""
    import json
    import tempfile

    from ..sources.files import infer_json_schema, read_json_objects

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 60)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )
    rows = orders.collect()  # bounded: < 60 keys at every SF
    lines = []
    for i, r in enumerate(rows):
        rec = {
            "okey": int(r["o_orderkey"]),
            "amount": float(i) + 0.25,
            "status": str(r["o_orderstatus"]),
            "flag": i % 2 == 0,
            "tags": ["a", "b"],
            "meta": {"clerk": str(r["o_orderpriority"])},
            "maybe": None if i % 2 == 0 else i,
            "mixed": i if i % 2 == 0 else i + 0.5,
        }
        lines.append(json.dumps(rec))
    work = tempfile.mkdtemp(prefix="infer_")
    obj = f"{work}/orders_sample.json"
    with open(obj, "w") as f:
        f.write("\n".join(lines) + "\n")

    inferred = infer_json_schema(lines)
    spark_schema = {
        f.name: f.dataType.simpleString()
        for f in read_json_objects(spark, obj).schema.fields
    }
    out = [
        (col, inferred[col], spark_schema[col]) for col in sorted(inferred)
    ]
    return spark.createDataFrame(
        out, "column_name string, value_rule_type string,"
        " spark_inferred_type string"
    ).orderBy("column_name")
