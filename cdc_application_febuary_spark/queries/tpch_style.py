"""TPC-H-style analytical queries over the fixture star schema — the
"arbitrary queries over replicated tables" tier (the reference's targets
are queried with plain SQL by its verification scripts; a user switching
engines expects full analytical SQL over the same tables).

Adapted to the fixture's columns (no l_shipmode/o_shippriority). Exactness:
``l_extendedprice * (1 - l_discount)`` products of 2-decimal values are
<= 4-decimal numbers well inside double's 53-bit mantissa, so the product
is exact; casting it to DECIMAL(38,6) before SUM makes the aggregate
order-independent and cross-engine identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle.strip()
        return fn

    return deco


_DISC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"
_CHARGE = "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))"

# ---------------------------------------------------------------------------
# Synthetic partsupp: the fixture lacks TPC-H's partsupp table, so Q9/Q11/
# Q20 derive one deterministically from part x {0..3} with pure integer
# arithmetic — the same closed-form formula runs as a Spark expression and
# as a DuckDB CTE, so both sides see the identical table without any
# on-disk fixture. 4 distinct suppliers per part ((p + i*13) % S is
# injective over i<4 for S in {10,100,1000}); supplycost has exactly 2
# conceptual decimals (k/100 + 1), so downstream products with integral
# quantities stay far from DECIMAL(38,6) rounding midpoints and the
# double->decimal cast agrees across engines.
# ---------------------------------------------------------------------------
_PARTSUPP_CTE = """
partsupp AS (
  SELECT p.p_partkey AS ps_partkey,
         (p.p_partkey + i.i * 13) % s.s_cnt AS ps_suppkey,
         CAST((p.p_partkey * 7 + i.i * 11) % 9999 + 1 AS INT) AS ps_availqty,
         ((p.p_partkey * 31 + i.i * 17) % 100000) / 100.0 + 1.0 AS ps_supplycost
  FROM part p
  CROSS JOIN (SELECT unnest(range(4)) AS i) i
  CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) s
)"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PARTSUPP_CTE`` — identical integer arithmetic, so
    every (partkey, suppkey, availqty, supplycost) matches the oracle's
    CTE bit-for-bit. The supplier count rides in as a 1-row broadcast
    (scalar-subquery shape), never a driver collect."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    i = spark.range(4).select(F.col("id").alias("i"))
    return (
        p.crossJoin(F.broadcast(i))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.pmod(F.col("p_partkey") + F.col("i") * 13, F.col("s_cnt")).alias(
                "ps_suppkey"
            ),
            (F.pmod(F.col("p_partkey") * 7 + F.col("i") * 11, F.lit(9999)) + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                F.pmod(F.col("p_partkey") * 31 + F.col("i") * 17, F.lit(100000))
                / F.lit(100.0)
                + F.lit(1.0)
            ).alias("ps_supplycost"),
        )
    )


@_q(
    "tpch_q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_CHARGE}) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(38,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc).cast("decimal(38,6)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "tpch_q2_min_price_part",
    """
SELECT p.p_partkey, p.p_name, p.p_type, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                         WHERE p2.p_type = p.p_type)
ORDER BY p.p_partkey
""",
)
def tpch_q2_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated min-per-group scalar subquery (TPC-H Q2 shape, adapted —
    the fixture has no partsupp). Spark-first: rewrite the correlated
    subquery as a broadcast join against the per-group min — the group table
    (distinct p_type) is tiny, so no shuffle lands on the fact side.

    Non-aggregated doubles compare exactly: MIN over identical inputs is the
    same double in both engines."""
    p = load_table(spark, sf_dir, "part")
    mins = (
        p.groupBy(F.col("p_type").alias("grp_type"))
        .agg(F.min("p_retailprice").alias("min_price"))
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.grp_type) & (p.p_retailprice == mins.min_price),
        )
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    )


@_q(
    "tpch_q3_shipping_priority",
    f"""
SELECT l.l_orderkey, CAST(SUM({_DISC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(F.sum(disc).cast("decimal(38,6)").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@_q(
    "tpch_q5_local_supplier_volume",
    f"""
SELECT n.n_name, CAST(SUM({_DISC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc).cast("decimal(38,6)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@_q(
    "tpch_q4_order_priority",
    """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left-semi join with a cross-side inequality (TPC-H Q4 shape;
    fixture has no l_commitdate/l_receiptdate, so the late-ship predicate is
    l_shipdate > o_orderdate). The semi join needs only (l_orderkey,
    l_shipdate) from the probe side — Catalyst prunes the rest of lineitem
    at the scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_q(
    "tpch_q6_forecast_revenue",
    f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-only aggregate (TPC-H Q6): every predicate reaches the parquet
    scan (shipdate range prunes row groups via min/max stats), and the agg is
    a one-row partial+final — zero joins, one narrow shuffle of partial sums.

    price(2dp) x discount(2dp) is a 4-decimal product, exact in a double, so
    the per-row DECIMAL(38,6) cast is lossless and the SUM order-independent."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)")
    return li.agg(
        F.sum(rev).cast("decimal(38,6)").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "tpch_q7_volume_shipping",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_DISC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume by ship year (TPC-H Q7 shape): two aliases
    of the same dimension joined from opposite fact sides, a disjunctive
    pair predicate, and year bucketing. Both nation sides broadcast; only
    lineitem<->orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(disc).cast("decimal(38,6)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_q(
    "tpch_q10_returned_items",
    f"""
SELECT c.c_custkey, c.c_name, CAST(SUM({_DISC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
       c.c_acctbal, c.c_mktsegment
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lost (returned) revenue in a quarter (TPC-H Q10
    shape). Both filters land before the joins; the final TakeOrdered runs
    on the aggregated (small) side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(F.sum(disc).cast("decimal(38,6)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_q(
    "tpch_q14_promo_effect",
    f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE),
         6) AS promo_revenue_pct,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share (TPC-H Q14): conditional aggregation over a fact
    x dimension join. The part side broadcasts (no shuffle of lineitem);
    the ratio is computed on exact decimal sums, then rounded as a double.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("decimal(38,6)").alias("promo_revenue"),
        F.sum(disc).cast("decimal(38,6)").alias("total_revenue"),
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * F.col("promo_revenue").cast("double")
            / F.col("total_revenue").cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        "promo_revenue",
        "total_revenue",
    )


@_q(
    "tpch_q15_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_DISC}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15): an aggregated view
    joined against its own MAX — the scalar-subquery-on-a-CTE shape. The
    revenue view is computed once and reused for both sides (Spark caches
    nothing here, but the agg output is tiny; the MAX side is a one-row
    broadcast). Decimal revenue keeps the MAX equality exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(disc).cast("decimal(38,6)").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_q(
    "tpch_q16_brand_supplier_cnt",
    """
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size >= 10
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
LIMIT 25
""",
)
def tpch_q16_brand_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count per group over a bridge join (TPC-H Q16 shape via
    lineitem, the fixture's partsupp stand-in). COUNT(DISTINCT) expands to
    a two-phase distinct-then-count under AQE; the part dimension broadcasts."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") >= 10)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
        )
        .limit(25)
    )


@_q(
    "tpch_q18_large_volume",
    """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(l_quantity) > 300)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
""",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18): IN-subquery with HAVING -> a
    semi-join against an aggregated key set. The qualifying key set is tiny
    (sub-0.1% of orders), so it broadcasts into the semi join; the HAVING
    filter on the raw double sum mirrors the oracle exactly (comparison
    only — the *emitted* sum is decimal)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


@_q(
    "tpch_q19_disjunctive",
    f"""
SELECT CAST(SUM({_DISC.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue, COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 5 AND 50
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-side predicates (TPC-H Q19): the OR spans both join
    sides, so it can't be pushed below the join — but the per-side envelope
    (brand IN (...), quantity <= 40) CAN be, and Catalyst derives exactly
    that. Part broadcasts; lineitem never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(5, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(disc).cast("decimal(38,6)").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "tpch_q22_idle_customers",
    """
SELECT c.c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > 5000
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no orders in a year (TPC-H Q22 shape):
    NOT EXISTS -> left-anti join against the filtered order keys, then a
    small grouped aggregate. The anti-join probe side is just the year's
    distinct custkeys."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_q(
    "tpch_q8_market_share",
    f"""
WITH vol AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         {_DISC} AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): a 7-table star join where
    every dimension (part, customer, nation x2, region, supplier) is
    broadcast-sized and only lineitem/orders shuffle; the share ratio is
    a conditional-sum over the same decimal volume. The two nation roles
    use two aliased reads of the same dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(38,6)")
            .alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_q(
    "tpch_q12_late_lines_by_status",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def tpch_q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay priority split (TPC-H Q12 shape; the fixture has no
    l_shipmode/l_receiptdate, so "late" is shipped >= 60 days after the
    order date and the group key is l_linestatus). Equi-join with a
    cross-side inequality + conditional counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_q(
    "tpch_q13_order_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): left outer join with
    an extra join-side predicate (the comment-filter analog), COUNT of a
    nullable column, then a second aggregation over the first's result —
    two shuffles, the second tiny."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_q(
    "tpch_q17_small_quantity_revenue",
    """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    average becomes a grouped aggregate joined back on partkey — one extra
    shuffle instead of a per-row subquery. The per-part average covers ALL
    lineitem rows (as in the spec), not just the brand's."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double") / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "tpch_q21_last_to_ship_supplier",
    """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def tpch_q21_last_to_ship_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose line shipped last in multi-supplier finalized
    orders (TPC-H Q21 shape; no l_receiptdate/l_commitdate in the fixture,
    so "kept the order waiting" = no other supplier's line shipped after
    theirs). EXISTS -> left-semi, NOT EXISTS -> left-anti, both on
    (orderkey, suppkey-inequality) conditions against the same lineitem."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = (
        l1.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
    )
    with_other = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    not_last = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not_last.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@_q(
    "tpch_q9_product_type_profit",
    f"""
WITH {_PARTSUPP_CTE.strip()}
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount)
              - ps.ps_supplycost * l.l_quantity AS DECIMAL(38,6)) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                  AND ps.ps_suppkey = l.l_suppkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
""",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape over the
    synthetic partsupp). The name-filtered part set prunes partsupp before
    it ever meets lineitem, and both ride in as broadcasts — only the
    lineitem<->orders join shuffles. amount is a 4-decimal-conceptual
    double, so the DECIMAL(38,6) cast is midpoint-safe cross-engine."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    ps = synth_partsupp(spark, sf_dir).join(
        F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"), "left_semi"
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    ).cast("decimal(38,6)")
    return (
        li.join(
            F.broadcast(ps),
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("decimal(38,6)").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@_q(
    "tpch_q11_important_stock",
    f"""
WITH {_PARTSUPP_CTE.strip()},
nat AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, ps.ps_availqty
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
),
grouped AS (
  SELECT ps_partkey,
         SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,2))) AS value_dec
  FROM nat GROUP BY ps_partkey
),
total AS (SELECT CAST(SUM(value_dec) AS DOUBLE) / COUNT(*) * 1.5 AS threshold
          FROM grouped)
SELECT g.ps_partkey, CAST(g.value_dec AS DOUBLE) AS value
FROM grouped g, total t
WHERE CAST(g.value_dec AS DOUBLE) > t.threshold
ORDER BY value DESC, ps_partkey ASC
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock by nation (TPC-H Q11 shape over the synthetic
    partsupp): per-part inventory value for one nation's suppliers,
    filtered against a multiple of the mean per-part value (scale-free,
    unlike the spec's fraction-of-total, which pins the pass rate to the
    group count) — the HAVING-vs-scalar-subquery shape. The scalar joins
    back as a 1-row broadcast; the comparison runs on identical doubles
    both sides. supplycost x availqty is 2-decimal-conceptual, so the
    DECIMAL(18,2) cast is midpoint-safe."""
    ps = synth_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    value = (F.col("ps_supplycost") * F.col("ps_availqty")).cast("decimal(18,2)")
    grouped = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(F.sum(value).alias("value_dec"))
        # r10: persist — the threshold scalar and the probe side each
        # planned the full synth-partsupp join+agg tree (16 parquet
        # scans, no exchange reuse); cached it is one pass + a tiny
        # per-part frame
        .persist()
    )
    total = grouped.agg(
        (F.sum("value_dec").cast("double") / F.count(F.lit(1)) * 1.5).alias(
            "threshold"
        )
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), F.col("ps_partkey").asc())
    )


@_q(
    "tpch_q20_potential_promotion",
    f"""
WITH {_PARTSUPP_CTE.strip()},
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sqty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_name LIKE 'blue%'
  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                 AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > 0.5 * sh.sqty
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN excess e ON e.ps_suppkey = s.s_suppkey
WHERE n.n_name = 'NATION_3'
ORDER BY s.s_suppkey
""",
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers overstocked on a part family (TPC-H Q20 shape over the
    synthetic partsupp): the correlated half-of-shipped-quantity subquery
    becomes a grouped aggregate equi-joined back on (partkey, suppkey).
    Quantity sums are integral doubles (order-independent), so the 0.5x
    comparison is exact cross-engine; the qualifying supplier set
    collapses through DISTINCT before the final semi-join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sqty")
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    ps = synth_partsupp(spark, sf_dir).join(
        F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"), "left_semi"
    )
    excess = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("sqty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
