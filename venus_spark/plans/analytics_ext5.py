"""Analytics extensions, part 5: behavioral structure — event-type
transition matrix, per-user activity distribution, and the
weekday×hour load heatmap. The journey/load views a product analytics
deployment serves beside the funnel/retention/session tiles (reference
surface stops at SELECTs over logs, README.rst:73-74; extensions tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.plans.registry import plan
from venus_spark.functions.sqlgen import dround_sql
from venus_spark.sources import load_table
from venus_spark.functions import dround

# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov view of journeys)
# --------------------------------------------------------------------------

_TRANSITION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       {dround_sql('n * CAST(1 AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)')} AS share
FROM trans
ORDER BY prev_type, next_type
"""


@plan("event_type_transitions", oracle=_TRANSITION_ORACLE)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count and within-row share of each (prev_type →
    next_type) step — the journey-structure view that generalizes
    event_paths' top first-3 journeys to the full |types|² matrix. The
    lag window partial-sorts per user (uniform key); the matrix itself
    is |types|² rows, so the share window runs over a tiny frame. The
    share is a ratio of exact counts — divides identically on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    share = F.col("n") / F.sum("n").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type", "next_type", "n", dround(share).alias("share")
    ).orderBy("prev_type", "next_type")


# --------------------------------------------------------------------------
# Per-user activity distribution (events-per-user histogram)
# --------------------------------------------------------------------------

_APU_WIDTH = 25

_ACTIVITY_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(n_events / {_APU_WIDTH}) AS BIGINT) * {_APU_WIDTH}
         AS bucket_lo,
       COUNT(*) AS n_users,
       MIN(n_events) AS min_events,
       MAX(n_events) AS max_events
FROM per_user
GROUP BY bucket_lo
ORDER BY bucket_lo
"""


@plan("user_activity_histogram", oracle=_ACTIVITY_ORACLE)
def user_activity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of events-per-user in fixed-width buckets with
    per-bucket extrema — the activity-concentration tile (whale vs
    casual split) that pairs with skew_hot_user_agg's single-hot-key
    posture: this is where you SEE the key-frequency distribution the
    skew machinery defends against. Two partial-aggregated groupBys
    (user, then bucket) — embarrassingly parallel, same shape as
    length_histogram on the text side."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    bucket = (
        F.floor(F.col("n_events") / _APU_WIDTH).cast("long") * _APU_WIDTH
    ).alias("bucket_lo")
    return (
        per_user.groupBy(bucket)
        .agg(
            F.count("*").alias("n_users"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
        )
        .orderBy("bucket_lo")
    )


# --------------------------------------------------------------------------
# Weekday × hour load heatmap
# --------------------------------------------------------------------------

# Spark dayofweek is 1=Sunday..7; DuckDB DAYOFWEEK is 0=Sunday..6 —
# normalize to DuckDB's 0-based form on the Spark side.
_HEATMAP_ORACLE = """
SELECT CAST(DAYOFWEEK(ts) AS INT) AS dow,
       CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY dow, hour_of_day
ORDER BY dow, hour_of_day
"""


@plan("weekday_hour_heatmap", oracle=_HEATMAP_ORACLE)
def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic heatmap: event and distinct-user counts per (weekday,
    hour-of-day) cell — the 7×24 capacity-planning view every ops
    dashboard carries. One scan, one partial-aggregated groupBy onto
    168 cells; the distinct is per-cell (bounded state). Weekday is
    normalized to DuckDB's 0=Sunday convention so the contract is
    explicit rather than engine-default."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour_of_day")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quartiles)
# --------------------------------------------------------------------------

_RFM_ASOF = "2001-09-01"  # analysis date: just past the last order date

# One shared tier string per dimension over the quartile scalars
# b1/b2/b3 (canonical doubles from the exact interpolated percentiles,
# identical in both engines — same precedent as value_percentiles).
def _rfm_tier(v: str, x: str) -> str:
    return (
        f"CASE WHEN {v} <= b1_{x} THEN 1 WHEN {v} <= b2_{x} THEN 2 "
        f"WHEN {v} <= b3_{x} THEN 3 ELSE 4 END"
    )


def _rfm_oracle() -> str:
    from venus_spark.functions.sqlgen import dround_sql, dsum_sql

    qs = "[0.25, 0.50, 0.75]"
    return f"""
WITH cust AS (
  SELECT o_custkey AS custkey,
         DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE), DATE '{_RFM_ASOF}')
           AS recency_days,
         COUNT(*) AS frequency,
         {dround_sql(f'''{dsum_sql(dround_sql('o_totalprice'))}''')} AS monetary
  FROM orders GROUP BY o_custkey
),
bp AS (
  SELECT QUANTILE_CONT(recency_days, {qs}) AS r,
         QUANTILE_CONT(frequency, {qs}) AS f,
         QUANTILE_CONT(monetary, {qs}) AS m
  FROM cust
),
bps AS (
  SELECT r[1] AS b1_r, r[2] AS b2_r, r[3] AS b3_r,
         f[1] AS b1_f, f[2] AS b2_f, f[3] AS b3_f,
         m[1] AS b1_m, m[2] AS b2_m, m[3] AS b3_m
  FROM bp
),
tiers AS (
  SELECT {_rfm_tier('recency_days', 'r')} AS r_tier,
         {_rfm_tier('frequency', 'f')} AS f_tier,
         {_rfm_tier('monetary', 'm')} AS m_tier,
         monetary
  FROM cust CROSS JOIN bps
)
SELECT r_tier, f_tier, m_tier,
       COUNT(*) AS n_customers,
       {dround_sql(f'''{dsum_sql('monetary')}''')} AS total_monetary
FROM tiers GROUP BY r_tier, f_tier, m_tier
ORDER BY r_tier, f_tier, m_tier
"""


@plan("rfm_segments", oracle=_rfm_oracle())
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per customer
    compute Recency (days since last order at a fixed analysis date),
    Frequency (order count), Monetary (exact decimal-summed lifetime
    spend), cut each dimension at its exact interpolated quartiles, and
    report segment sizes and total spend per (r, f, m) tier cell
    (the total, not the mean: a mean can land exactly on a 6-dp ROUND
    boundary where the engines' double-rounding split — the decimal
    sum cannot).
    Tiers are ascending numeric in every dimension (tier 1 = lowest
    value of the measure; consumers relabel to champion/at-risk names).

    Scale shape: one shuffle onto o_custkey for the per-customer
    aggregate; the quartiles run over the CUSTOMER-sized table (orders
    never flow through a percentile buffer) and come back as one
    9-scalar row broadcast onto the same table for the CASE
    assignment; the final groupBy lands on at most 64 cells. At 100 TB
    the drop-in for the exact quartiles is approx_percentile, kept
    exact here so the oracle can hash values (same policy as
    value_percentiles)."""
    from venus_spark.functions import dsum, dround

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_ASOF).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        dround(dsum(dround("o_totalprice"))).alias("monetary"),
    )
    # Lineage-cut on cust tried and REJECTED (r15): the orders groupBy
    # re-run under the quartile build is cheaper than the checkpoint
    # barrier (1.06x slower, REPEAT=3).
    qs = [F.lit(x) for x in (0.25, 0.50, 0.75)]
    bp = cust.agg(
        F.percentile("recency_days", F.array(*qs)).alias("r"),
        F.percentile("frequency", F.array(*qs)).alias("f"),
        F.percentile("monetary", F.array(*qs)).alias("m"),
    ).select(
        *[
            F.col(x)[i].alias(f"b{i + 1}_{x}")
            for x in ("r", "f", "m")
            for i in range(3)
        ]
    )
    tiers = cust.crossJoin(F.broadcast(bp)).select(
        F.expr(_rfm_tier("recency_days", "r")).alias("r_tier"),
        F.expr(_rfm_tier("frequency", "f")).alias("f_tier"),
        F.expr(_rfm_tier("monetary", "m")).alias("m_tier"),
        "monetary",
    )
    return (
        tiers.groupBy("r_tier", "f_tier", "m_tier")
        .agg(
            F.count("*").alias("n_customers"),
            dround(dsum("monetary")).alias("total_monetary"),
        )
        .orderBy("r_tier", "f_tier", "m_tier")
    )


# --------------------------------------------------------------------------
# Data-quality expectations (the validation gate of a data pipeline)
# --------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT 'events_value_in_range' AS check_name,
       CAST(COUNT(*) FILTER (value < 0 OR value > 1000) AS BIGINT) AS n_violations,
       COUNT(*) FILTER (value < 0 OR value > 1000) = 0 AS passed
FROM events
UNION ALL
SELECT 'events_user_id_not_null',
       CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT),
       COUNT(*) FILTER (user_id IS NULL) = 0
FROM events
UNION ALL
SELECT 'documents_n_chars_consistent',
       CAST(COUNT(*) FILTER (n_chars <> LENGTH(text)) AS BIGINT),
       COUNT(*) FILTER (n_chars <> LENGTH(text)) = 0
FROM documents
UNION ALL
SELECT 'orders_custkey_referential',
       CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
ORDER BY check_name
"""


@plan("data_quality_checks", oracle=_DQ_ORACLE)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation gate every pipeline runs before promoting a
    batch: declarative expectations evaluated as ONE pass per table —
    range and null-rate checks fold into per-table aggregates (a
    violation count each, no row ever leaves the scan), and the
    referential check (every order's customer exists) is a broadcast
    anti-join producing a count. Emits (check_name, n_violations,
    passed) so a scheduler can gate on `passed` and an operator can
    triage by count — and the ORACLE recomputes every expectation
    independently, so the validation logic itself is cross-engine
    certified, not just asserted. At 100 TB each check stays one
    partial-aggregating scan; new expectations are new aggregate
    columns on the same pass, not new scans."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def row(name, viol_col, df):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.sum(F.when(viol_col, 1).otherwise(0)).cast("long").alias(
                "n_violations"
            ),
        ).select(
            "check_name",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )

    checks = [
        row(
            "events_value_in_range",
            (F.col("value") < 0) | (F.col("value") > 1000),
            ev,
        ),
        row("events_user_id_not_null", F.col("user_id").isNull(), ev),
        row(
            "documents_n_chars_consistent",
            F.col("n_chars") != F.length("text"),
            docs,
        ),
        row(
            "orders_custkey_referential",
            F.col("c_custkey").isNull(),
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders["o_custkey"] == cust["c_custkey"],
                "left",
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")
