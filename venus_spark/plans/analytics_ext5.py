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
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov view of journeys)
# --------------------------------------------------------------------------

_TRANSITION_ORACLE = """
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
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS share
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
        "prev_type", "next_type", "n", F.round(share, 6).alias("share")
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
