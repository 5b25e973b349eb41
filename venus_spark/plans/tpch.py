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
    """
    li = load_table(spark, sf_dir, "lineitem")
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
