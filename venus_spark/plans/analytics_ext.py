"""Extended analytics surface: window functions, sessionization,
rollup/grouping sets, set operators.

The reference has none of these (SURVEY.md §2C — explicitly absent);
they come free from Spark SQL and round out what a user of a general
analytics engine expects. Each plan is oracle-checked like the rest.

Scale notes: window functions partition by uniform keys (user_id,
event_type) — one shuffle into the window partitioning, then streaming
evaluation per partition; sessionization is the classic
gaps-and-islands (lag + conditional cumsum) which computes in the same
single window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import dsum, fmt_ts, dround
from venus_spark.functions.sqlgen import dround_sql, dsum_sql, fmt_ts_sql
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Ranking window: top-3 events by value per event_type
# --------------------------------------------------------------------------

_TOPN_ORACLE = f"""
SELECT event_type, event_id, value AS event_value, rn
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events WHERE value IS NOT NULL
)
WHERE rn <= 3
"""


@plan("window_topn_per_type", oracle=_TOPN_ORACLE)
def window_topn_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking window; Spark pushes a per-partition top-k
    (WindowGroupLimit) below the shuffle, so no partition materializes
    more than 3 rows per group on the map side."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.col("value").alias("event_value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Running (cumulative) aggregate per user
# --------------------------------------------------------------------------

_RUNNING_ORACLE = f"""
SELECT event_id, user_id,
       {dround_sql('''SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING)''', 4)} AS running_value
FROM events WHERE user_id <= 50 AND value IS NOT NULL
"""


@plan("window_running_total", oracle=_RUNNING_ORACLE)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user ordered by time — ROWS UNBOUNDED PRECEDING
    evaluates incrementally in one pass per partition. Both engines
    accumulate doubles in identical (ts, event_id) order, so values match
    bit-for-bit; rounded only to guard the display edge."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.filter((F.col("user_id") <= 50) & F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        dround(F.sum("value").over(w), 4).alias("running_value"),
    )


# --------------------------------------------------------------------------
# Sessionization: gaps-and-islands (lag + conditional cumsum)
# --------------------------------------------------------------------------

_GAP_MINUTES = 60

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {_GAP_MINUTES} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  -- cumsum tie-order must match the Spark window exactly: (ts, event_id)
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         EPOCH(MAX(ts) - MIN(ts)) AS duration_sec
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       {dsum_sql('n_events')} AS total_events,
       {dsum_sql('duration_sec')} AS total_duration_sec
FROM per_session GROUP BY user_id
"""


@plan("sessionize_events", oracle=_SESSION_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (> {gap} min of silence starts a new
    session): lag + conditional cumulative sum — one window shuffle on
    user_id computes both steps; the per-session rollup reuses the same
    partitioning so AQE elides a second exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr(f"INTERVAL {_GAP_MINUTES} MINUTE"))
    ).cast("int")
    sessions = ev.select(
        "user_id",
        "ts",
        F.sum(new_session).over(wcum).alias("session_id"),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        # Microsecond-exact duration (unix_timestamp would truncate the
        # sub-second part and diverge from the oracle's EPOCH()).
        (
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / F.lit(1000000.0)
        ).alias("duration_sec"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        dsum("n_events").alias("total_events"),
        dsum("duration_sec").alias("total_duration_sec"),
    )


# --------------------------------------------------------------------------
# Rollup (hierarchical subtotals) with grouping flags
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       GROUPING(l_returnflag) + GROUPING(l_linestatus) AS rollup_level,
       COUNT(*) AS n_lines,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@plan("rollup_lineitem_status", oracle=_ROLLUP_ORACLE)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotal hierarchy — Catalyst expands to a single Expand +
    hash aggregate (one scan for all grouping sets).

    fan-out tried and REJECTED (r15): unlike q1 (seven decimal
    accumulators), one dsum + count over the Expand stream is light
    enough that the fan exchange was pure overhead (1.03x, interleaved
    A/B REPEAT=3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).alias(
                "rollup_level"
            ),
            F.count("*").alias("n_lines"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "rollup_level",
            "n_lines",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# Set operators: INTERSECT / EXCEPT between behavioral cohorts
# --------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
     buy AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'error_and_purchase' AS cohort, COUNT(*) AS n_users
FROM (SELECT user_id FROM err INTERSECT SELECT user_id FROM buy)
UNION ALL
SELECT 'error_only' AS cohort, COUNT(*) AS n_users
FROM (SELECT user_id FROM err EXCEPT SELECT user_id FROM buy)
ORDER BY cohort
"""


@plan("setops_cohorts", oracle=_SETOPS_ORACLE)
def setops_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT cohort arithmetic — Spark plans both as hash
    joins over the distinct sets (semi/anti), no sort."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = err.intersect(buy).agg(F.count("*").alias("n_users")).select(
        F.lit("error_and_purchase").alias("cohort"), "n_users"
    )
    only = err.exceptAll(buy).agg(F.count("*").alias("n_users")).select(
        F.lit("error_only").alias("cohort"), "n_users"
    )
    return both.unionAll(only).orderBy("cohort")
