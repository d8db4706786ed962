"""The declared correctness queries Q1-Q20 (SURVEY.md §2.11) as DataFrame
plans, each with a DuckDB oracle SQL string.

Cross-engine exactness rules (so the driver's value-hash matches bit-for-bit):

* counts stay integer end-to-end; DuckDB ``SUM`` over ints returns HUGEINT,
  so oracles cast conditional-sum counters to BIGINT.
* sums over double *price* columns go through ``DECIMAL(18,2)`` on both
  sides — the fixture prices are exact 2-decimal values, so the decimal sum
  is exact and order-independent (a raw double sum is neither).
* ``AVG``/``STDDEV`` results are rounded (6 / 4 places) on both sides; the
  cross-engine accumulation-order error is orders of magnitude below the
  rounding granularity.

Scale notes are inline per query; the guiding rule is: no collect, no Python
row loop, joins declared so Catalyst can broadcast dimensions, aggregations
declared so partial (map-side) aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..functions.changelog import DELETE_CODES, INSERT_CODES, UPDATE_CODES


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1 (P1,P4,O1): projection + time filter + sort/limit pagination --------
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The time filter runs on the NATIVE stored column so it pushes down to
    # parquet row-group stats (a filter on a converted expression cannot);
    # TakeOrderedAndProject avoids a global sort for the limit.
    from ..catalog import events_ts, push_ts_filter

    raw = push_ts_filter(spark, sf_dir, "2024-01-01 00:00:00")
    return (
        events_ts(raw)
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .drop("ts")
    )


Q1_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
ORDER BY ts DESC, event_id DESC
LIMIT 100
"""


# --- Q2 (A1,F10): op-code normalization + group count -----------------------
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin(*INSERT_CODES), F.lit("insert"))
        .when(F.col("event_type").isin(*UPDATE_CODES), F.lit("update"))
        .when(F.col("event_type").isin(*DELETE_CODES), F.lit("delete"))
        .otherwise(F.lit("other"))
    )
    return (
        ev.groupBy(op.alias("op"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("op")
    )


Q2_SQL = """
SELECT CASE WHEN event_type IN ('c','r','insert','i') THEN 'insert'
            WHEN event_type IN ('u','update')          THEN 'update'
            WHEN event_type IN ('d','delete','remove') THEN 'delete'
            ELSE 'other' END AS op,
       COUNT(*) AS cnt
FROM events
GROUP BY 1
ORDER BY op
"""


# --- Q3 (A2,A3): status-bucket counts and success rate ----------------------
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    applied = F.sum(F.when(F.col("value") >= 0.5, 1).otherwise(0))
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        applied.alias("applied"),
        (applied.cast("double") / F.count(F.lit(1))).alias("success_rate"),
    )


Q3_SQL = """
SELECT COUNT(*) AS total,
       CAST(SUM(CASE WHEN value >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS applied,
       CAST(SUM(CASE WHEN value >= 0.5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS success_rate
FROM events
"""


# --- Q4 (A13,T7): tumbling daily window by op type --------------------------
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # At scale the event log is date-partitioned, so this groupBy prunes to
    # the partitions in range; partial aggregation bounds the shuffle to
    # (days x types) rows.
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("day", "event_type")
    )


Q4_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


# --- Q5 (A14): hourly average trend -----------------------------------------
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("hour")
    )


Q5_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(*) AS n
FROM events
GROUP BY 1
ORDER BY hour
"""


# --- Q6 (A15,O3): per-entity activity top-10 --------------------------------
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    flag = lambda codes: F.sum(
        F.when(F.col("event_type").isin(codes), 1).otherwise(0)
    )
    return (
        ev.groupBy("user_id")
        .agg(
            flag("insert").alias("ins"),
            flag("update").alias("upd"),
            flag("delete").alias("del"),
            F.count(F.lit(1)).alias("total"),
        )
        .orderBy(F.col("total").desc(), F.col("user_id").asc())
        .limit(10)
    )


Q6_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type='insert' THEN 1 ELSE 0 END) AS BIGINT) AS ins,
       CAST(SUM(CASE WHEN event_type='update' THEN 1 ELSE 0 END) AS BIGINT) AS upd,
       CAST(SUM(CASE WHEN event_type='delete' THEN 1 ELSE 0 END) AS BIGINT) AS del,
       COUNT(*) AS total
FROM events
GROUP BY user_id
ORDER BY total DESC, user_id ASC
LIMIT 10
"""


# --- Q7 (A5-A8): column profiling block -------------------------------------
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One pass over the table: all profile stats in a single aggregate so the
    # scan happens once (the reference issues one SQL query per stat —
    # sqlserver.py:1895-1986).
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_cnt"),
        F.countDistinct("l_returnflag").alias("distinct_flags"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
        F.round(F.avg("l_extendedprice"), 6).alias("mean_p"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_p"),
        F.min(F.length("l_linestatus")).alias("min_len"),
        F.max(F.length("l_linestatus")).alias("max_len"),
    )


Q7_SQL = """
SELECT COUNT(*) AS row_count,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
       COUNT(DISTINCT l_returnflag) AS distinct_flags,
       MIN(l_extendedprice) AS min_p, MAX(l_extendedprice) AS max_p,
       ROUND(AVG(l_extendedprice), 6) AS mean_p,
       ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_p,
       CAST(MIN(LENGTH(l_linestatus)) AS INT) AS min_len,
       CAST(MAX(LENGTH(l_linestatus)) AS INT) AS max_len
FROM lineitem
"""


# --- Q8 (A9,O2): top-10 frequent values -------------------------------------
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(10)
    )


Q8_SQL = """
SELECT l_returnflag AS value, COUNT(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY cnt DESC, value ASC
LIMIT 10
"""


# --- Q9 (equi join + agg): per-segment revenue ------------------------------
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer is the dimension side: broadcast it so the orders fact never
    # shuffles for the join (at 100 TB orders is the table you must not move).
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


Q9_SQL = """
SELECT c.c_mktsegment, COUNT(*) AS orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


# --- Q10 (broadcast dimension chain): 3-way join ----------------------------
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("decimal(38,2)").alias("bal"),
        )
        .orderBy("r_name", "n_name")
    )


Q10_SQL = """
SELECT r.r_name, n.n_name, COUNT(*) AS customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
"""


# --- Q11 (J1, anti join): reconciliation diff -------------------------------
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )


Q11_SQL = """
SELECT COUNT(*) AS orphans
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


# --- Q12 (semi join) --------------------------------------------------------
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority == "1-URGENT"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q12_SQL = """
SELECT COUNT(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT')
"""


# --- Q13 (set ops): intersect ----------------------------------------------
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.intersect(c).agg(F.count(F.lit(1)).alias("n"))


Q13_SQL = """
SELECT COUNT(*) AS n FROM (
  SELECT o_custkey AS k FROM orders
  INTERSECT
  SELECT c_custkey FROM customer
) t
"""


# --- Q14 (W1/SCD2 current-state): latest event per user ---------------------
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # row_number over (user, ts desc) — the SCD2 current-state reconstruction
    # pattern (SURVEY §2.5). One shuffle on the partition key; at scale the
    # event log is already bucketed by key so this becomes shuffle-free.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    )


Q14_SQL = """
SELECT user_id, event_type, value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) x
WHERE rn = 1
ORDER BY user_id
"""


# --- Q15 (SCD2 live-rows): exclude keys whose latest op is delete -----------
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") != "delete"))
        .agg(F.count(F.lit(1)).alias("live_keys"))
    )


Q15_SQL = """
SELECT COUNT(*) AS live_keys FROM (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         event_type
  FROM events) x
WHERE rn = 1 AND event_type <> 'delete'
"""


# --- Q16 (analytic): running daily total ------------------------------------
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # unpartitioned window BY DESIGN: input is the post-aggregation daily
    # table (rows == distinct days — calendar-bounded, not data-scale)
    w = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn("cum", F.sum("cnt").over(w)).orderBy("day")


Q16_SQL = """
SELECT day, cnt,
       CAST(SUM(cnt) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt FROM events GROUP BY 1) d
ORDER BY day
"""


# --- Q17 (F7/JSON scalar): extract a field from the JSON props --------------
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.agg(
        F.sum(F.when(k.isNotNull(), 1).otherwise(0)).alias("with_k"),
        F.sum(k.cast("bigint")).alias("sum_k"),
    )


Q17_SQL = """
SELECT CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
"""


# --- Q18 (date scalars): event-time bucketing -------------------------------
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = F.to_date("ts")
    return ev.agg(
        F.min(d).alias("first_day"),
        F.max(d).alias("last_day"),
        F.countDistinct(d).alias("active_days"),
    )


Q18_SQL = """
SELECT MIN(CAST(ts AS DATE)) AS first_day, MAX(CAST(ts AS DATE)) AS last_day,
       COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
FROM events
"""


# --- Q19 (theta/range join) -------------------------------------------------
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi-key + range predicate: Catalyst plans the equi part as the join
    # key and evaluates the inequality as a post-join filter — no nested loop.
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q19_SQL = """
SELECT COUNT(*) AS n
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
"""


# --- Q20 (distinct tier) ----------------------------------------------------
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact here for the oracle; the engine also exposes
    # approx_count_distinct(user_id, rsd) as the 100 TB tier.
    ev = _t(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("user_id").alias("u"))


Q20_SQL = """
SELECT COUNT(DISTINCT user_id) AS u FROM events
"""


QUERIES = {f"q{i}": globals()[f"q{i}"] for i in range(1, 21)}
ORACLES = {f"q{i}": globals()[f"Q{i}_SQL"].strip() for i in range(1, 21)}
