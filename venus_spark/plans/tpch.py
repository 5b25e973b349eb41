"""TPC-H-style analytics over the synthetic star schema (TESTDATA.md).

The reference outsources all planning/execution to PostgreSQL (SURVEY.md
§3.2, §4); these plans are the equivalent analytics surface expressed
declaratively so Catalyst does pushdown, join selection and AQE.

Scale notes (100 TB posture):
- q1/q6: single scan + partial (map-side) aggregation; the groupBy key
  cardinality is tiny so the shuffle is a few KB per task.
- q3/q5: the dimension sides (customer, nation, region, supplier) are
  broadcast — no shuffle of the fact table for those joins; only
  fact-to-fact joins (orders ⋈ lineitem) shuffle, on their natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum
from venus_spark.functions.sqlgen import davg_sql, dsum_sql
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_Q1_CUTOFF = "1998-09-02 00:00:00"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@plan("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    One parquet scan (shipdate filter pushed down), hash aggregate with
    map-side partial agg, 4-group output. Whole plan stays in codegen.

    fanned (r15): the seven decimal(38,6) accumulators dominate the map
    side, and the one-row-group input runs it all in a single task
    (OPTIMIZATION_r15.md batch 2); the fan-out exchange carries only the
    pruned+filtered 6 columns, and exact decimal sums/counts are
    partition-order independent, so the 4-group result is bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem", fanned=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, grouped revenue, top-k
# --------------------------------------------------------------------------

_Q3_SEG = "BUILDING"
_Q3_DATE = "1998-03-15 00:00:00"

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEG}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l.l_orderkey, orderdate, priority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@plan("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3. customer is broadcast (dimension); orders ⋈ lineitem is
    the only shuffle, co-partitioned on orderkey; final top-k is
    TakeOrderedAndProject, not a global sort."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(_Q3_DATE).cast("timestamp_ntz")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == _Q3_SEG)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS -> left-semi join)
# --------------------------------------------------------------------------

_Q4_T0, _Q4_T1 = "1997-07-01 00:00:00", "1997-10-01 00:00:00"

_Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_T0}'
  AND o_orderdate < TIMESTAMP '{_Q4_T1}'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@plan("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS subquery as a left-semi join (no row duplication,
    no distinct needed)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(_Q4_T0).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q4_T1).cast("timestamp_ntz"))
    )
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-table join through two dimension chains
# --------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_T0, _Q5_T1 = "1996-01-01 00:00:00", "1998-01-01 00:00:00"

_Q5_ORACLE = f"""
SELECT n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_T0}'
  AND o.o_orderdate < TIMESTAMP '{_Q5_T1}'
GROUP BY nation
ORDER BY revenue DESC
"""


@plan("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5. region/nation/supplier/customer are all broadcast; the
    single shuffled join is orders ⋈ lineitem on orderkey. The
    c_nationkey = s_nationkey 'local supplier' condition rides on the
    broadcast join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(_Q5_T0).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q5_T1).cast("timestamp_ntz"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == _Q5_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + scalar aggregate
# --------------------------------------------------------------------------

_Q6_T0, _Q6_T1 = "1997-01-01 00:00:00", "1998-01-01 00:00:00"

_Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_T0}'
  AND l_shipdate < TIMESTAMP '{_Q6_T1}'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@plan("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: all four predicates push to the parquet scan; the
    aggregate is a single partial+final sum, no wide shuffle at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_Q6_T0).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(_Q6_T1).cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
