"""TPC-H-style analytics, part 2: Q7-Q22 adapted to the synthetic
schema (TESTDATA.md has no partsupp table and lineitem carries no
commitdate/receiptdate/shipmode, so the affected queries are adapted
variants that keep the join/aggregation *shape* of the original).

Scale notes (100 TB posture):
- Every dimension side (nation, region, part, supplier, customer) is
  broadcast; the only shuffled joins are fact-to-fact
  (orders ⋈ lineitem) on their natural co-partition key.
- Group-by keys are low-cardinality (nation, year, brand, priority) so
  partial aggregation collapses the shuffle to KBs per task.
- Q13/Q17/Q18 contain genuinely wide aggregations (per-customer,
  per-part, per-order); those shuffle on uniform keys — the layouts AQE
  handles without skew mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum, dround
from venus_spark.functions.sqlgen import davg_sql, dround_sql, dsum_sql
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# --------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"
_Q7_T0, _Q7_T1 = "1996-01-01 00:00:00", "1998-01-01 00:00:00"

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
      OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
    AND l.l_shipdate >= TIMESTAMP '{_Q7_T0}'
    AND l.l_shipdate < TIMESTAMP '{_Q7_T1}'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@plan("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7. nation/supplier/customer broadcast; orders ⋈ lineitem is
    the one shuffled join; the two-nation disjunction filters after the
    broadcast joins (tiny rows by then)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # Pre-reduce both facts BEFORE the fact-fact exchange (r15, same
    # rationale as q8): the disjunction only admits suppliers and
    # customers from the two named nations, so each side can apply its
    # broadcast nation prune first — lineitem and orders both shrink
    # ~12x ahead of the only shuffle; the cross-side disjunction still
    # runs after the join. Inner joins + implied one-sided filters —
    # result unchanged.
    two = (_Q7_N1, _Q7_N2)
    li_red = (
        li.filter(
            (F.col("l_shipdate") >= _ts(_Q7_T0)) & (F.col("l_shipdate") < _ts(_Q7_T1))
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n1.filter(F.col("supp_nation").isin(*two))),
            F.col("s_nationkey") == F.col("n1_key"),
        )
    )
    ord_red = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).join(
        F.broadcast(n2.filter(F.col("cust_nation").isin(*two))),
        F.col("c_nationkey") == F.col("n2_key"),
    )
    return (
        li_red.join(ord_red, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share within a region, by year (adapted: volume
# is extendedprice*(1-discount); no partsupp cost side exists)
# --------------------------------------------------------------------------

_Q8_NATION = "NATION_3"
_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"

_Q8_ORACLE = f"""
SELECT o_year,
       {dround_sql(f'''{dsum_sql('nation_volume')} / {dsum_sql('volume')}''')} AS mkt_share
FROM (
  SELECT YEAR(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         CASE WHEN n1.n_name = '{_Q8_NATION}'
              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
           AS nation_volume
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@plan("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join where everything but orders ⋈ lineitem
    broadcasts; market share = conditional-sum / sum in one aggregation
    pass (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(F.col("supp_nation") == _Q8_NATION, volume).otherwise(0.0)
    # Join order matters (r15; guide §2.3 "shuffle fewer bytes"): the
    # rule-based planner keeps the written order, so putting the
    # orders ⋈ lineitem exchange FIRST shuffled both fact tables at
    # full width. Applying every broadcast dimension filter first cuts
    # lineitem ~6x (p_type) and orders ~5x (customer region) BEFORE the
    # only fact-fact exchange; inner joins commute, so the result is
    # unchanged.
    li_red = (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == _Q8_TYPE)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    )
    ord_red = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == _Q8_REGION)),
            F.col("n2_region") == F.col("r_regionkey"),
        )
    )
    return (
        li_red.join(ord_red, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(dround(dsum(nation_volume) / dsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (adapted: profit is
# revenue = extendedprice*(1-discount); no ps_supplycost in the schema)
# --------------------------------------------------------------------------

_Q9_PART_LIKE = "%gear%"

_Q9_ORACLE = f"""
SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '{_Q9_PART_LIKE}'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@plan("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape. The p_name LIKE filter lands on the broadcast
    build side, shrinking the probe early; group keys (nation, year) are
    tiny so the agg shuffle is negligible."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like(_Q9_PART_LIKE))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: top customers by lost revenue
# --------------------------------------------------------------------------

_Q10_T0, _Q10_T1 = "1997-01-01 00:00:00", "1997-04-01 00:00:00"

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_T0}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_T1}'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, nation, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@plan("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10. returnflag + date filters push to the scans; per-customer
    aggregation shuffles on c_custkey (uniform); top-20 is a heap, not a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts(_Q10_T0))
                & (F.col("o_orderdate") < _ts(_Q10_T1))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal"
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double agg)
# --------------------------------------------------------------------------

_Q13_EXCLUDE = "1-URGENT"

_Q13_ORACLE = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '{_Q13_EXCLUDE}'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@plan("q13_order_distribution", oracle=_Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join (customers with zero orders count as 0)
    then a two-level aggregation; the second agg's input is one row per
    customer so it collapses fast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != _Q13_EXCLUDE),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect (conditional aggregation over one join)
# --------------------------------------------------------------------------

_Q14_T0, _Q14_T1 = "1997-06-01 00:00:00", "1997-07-01 00:00:00"

_Q14_ORACLE = f"""
SELECT {dround_sql(f'''100.0 * {dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')}''')}
         AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_T0}'
  AND l.l_shipdate < TIMESTAMP '{_Q14_T1}'
"""


@plan("q14_promo_effect", oracle=_Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: broadcast part join + one conditional scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0)
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts(_Q14_T0)) & (F.col("l_shipdate") < _ts(_Q14_T1))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dround(100.0 * dsum(promo) / dsum(revenue)).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (window max, ties kept)
# --------------------------------------------------------------------------

_Q15_T0, _Q15_T1 = "1997-01-01 00:00:00", "1997-04-01 00:00:00"

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_T0}'
    AND l_shipdate < TIMESTAMP '{_Q15_T1}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@plan("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: per-supplier revenue, then the scalar max as a one-row
    aggregate broadcast back onto the revenue relation — no second scan
    of lineitem and no single-partition window (an unpartitioned window
    would drag the whole aggregated relation to one task; at SF100k the
    per-supplier relation is 10M rows, so the broadcast-scalar shape is
    the one that survives scale-up)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts(_Q15_T0)) & (F.col("l_shipdate") < _ts(_Q15_T1))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    best = revenue.join(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        best.join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-part average threshold)
# --------------------------------------------------------------------------

_Q17_BRAND = "Brand#13"

_Q17_ORACLE = f"""
WITH avg_qty AS (
  SELECT l_partkey, {davg_sql('l_quantity')} AS part_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT {dround_sql(f'''{dsum_sql('l.l_extendedprice')} / 7.0''')} AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND l.l_quantity < 0.2 * a.part_avg
"""


@plan("q17_small_quantity", oracle=_Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated avg subquery decorrelates into a
    per-part WINDOW average over the brand-filtered lineitems (r15) —
    the brand predicate selects whole parts, so the window over the
    broadcast-join survivors sees exactly every lineitem of each
    qualifying part and reproduces the oracle's full-table per-part
    davg bit-for-bit (same decimal sum / non-null count / dround).
    The pre-r15 shape aggregated the FULL lineitem table on one shuffle
    branch and joined it against a second shuffled branch; this shape
    scans lineitem once, prunes to the brand's ~0.1% of rows while the
    filter is still a broadcast hash join, and shuffles only those
    survivors once for the window."""
    from pyspark.sql import Window

    from venus_spark.functions import DECIMAL_ACC

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    # davg(c) == dround(dsum(c)/count(c)) spelled in window form
    part_avg = dround(
        F.sum(F.col("l_quantity").cast(DECIMAL_ACC)).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == _Q17_BRAND)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("part_avg", part_avg)
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg"))
        .agg(
            dround(dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING on a fact-side aggregate)
# --------------------------------------------------------------------------

_Q18_MIN_QTY = 300

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > {_Q18_MIN_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@plan("q18_large_orders", oracle=_Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: aggregate lineitem per order first (collapses the fact
    table ~4:1 before any join), semi-filter with HAVING, then join the
    survivors — tiny by construction — against orders/customer.

    fan-out tried and REJECTED (r15): even at ~4:1 the partial
    aggregate collapses enough that the added round-robin exchange of
    the raw pair stream cost more than the single-task hash-agg it
    parallelized (1.74x slower, REPEAT=3)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@plan("q18_colocated", oracle=_Q18_ORACLE)
def q18_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over the co-bucketed layout (prepared.bucketed_sales):
    lineitem and orders are both bucketed+sorted on the order key, so
    the per-order aggregation AND the orders join consume the storage
    distribution — no exchange of either fact table in the physical
    plan (the .explain has zero Exchange below the final ordering; the
    unbucketed twin shuffles lineitem once and orders once). Identical
    oracle to q18_large_orders: layout changes the plan, not the
    answer."""
    from venus_spark.prepared import bucketed_sales

    li_name, ord_name = bucketed_sales(spark, sf_dir)
    li, orders = spark.table(li_name), spark.table(ord_name)
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive brand/size/quantity predicates)
# --------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@plan("q19_discounted_revenue", oracle=_Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: a disjunction that mixes build-side (brand/size) and
    probe-side (quantity) predicates — evaluated on the broadcast-joined
    row, one scalar aggregate out."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    pred = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: nation segment instead of
# phone country code — the schema has no c_phone)
# --------------------------------------------------------------------------

_Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)
# "Inactive" horizon: no order on/after this date (every synthetic
# customer has *some* order, so the original lifetime NOT EXISTS is
# vacuous; the windowed variant keeps the anti-join shape non-trivial).
_Q22_RECENT = "2001-01-01 00:00:00"

_Q22_ORACLE = f"""
WITH pos AS (
  SELECT {davg_sql('c_acctbal')} AS avg_bal FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN {_Q22_NATIONS}
)
SELECT c.c_nationkey AS segment, COUNT(*) AS numcust,
       {dsum_sql('c.c_acctbal')} AS totacctbal
FROM customer c, pos
WHERE c.c_nationkey IN {_Q22_NATIONS}
  AND c.c_acctbal > pos.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{_Q22_RECENT}')
GROUP BY segment
ORDER BY segment
"""


@plan("q22_sales_opportunity", oracle=_Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average threshold (broadcast single-row
    cross join), NOT EXISTS as a left-anti join against recent orders,
    grouped by the nation segment."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts(_Q22_RECENT)
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*_Q22_NATIONS)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("segment"))
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
        .orderBy("segment")
    )
