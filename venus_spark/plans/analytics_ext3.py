"""Analytics extensions, part 3: GROUPING SETS, frame-bounded moving
averages, NTILE decile summaries, and ordered event-path analysis —
the remaining window/aggregation surfaces of the documented SQL family
(`/root/reference/README.rst:82-107` delegates all of this shape of
work to PostgreSQL; these are the idioms a dashboard over the same
schema runs).

Same parity discipline as parts 1-2: shared scalar formulas via
``F.expr``; double math through explicit casts (never exact-numeric
literals); decimal accumulators for float sums; deterministic
tiebreaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import dsum, fmt_ts, dround
from venus_spark.functions.sqlgen import dround_sql, dsum_sql, fmt_ts_sql
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# GROUPING SETS: the explicit-subset sibling of ROLLUP/CUBE — per-priority
# and per-status subtotals plus the grand total, but NOT the cross product
# --------------------------------------------------------------------------

_GSETS_ORACLE = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


@plan("grouping_sets_orders", oracle=_GSETS_ORACLE)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((priority), (status), ()) — three aggregation
    grains in one Expand + partial-agg pass over a single scan, where
    CUBE would also pay for the (priority × status) grain nobody asked
    for. Same one-shuffle shape as the rollup/cube twins."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Frame-bounded moving average: 6-hour trailing mean of hourly counts —
# the smoothing pass every monitoring dashboard applies
# --------------------------------------------------------------------------

# Frame sum/count are exact BIGINTs; one shared double formula rounds
# the quotient identically on both engines.
_MAVG = f"{dround_sql('CAST(s AS DOUBLE) / cnt')}"

_MAVG_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS b, COUNT(*) AS c
  FROM events GROUP BY event_type, b
),
framed AS (
  SELECT event_type, b, c,
         SUM(c) OVER w AS s, COUNT(c) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY b
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT event_type, {fmt_ts_sql('b', micros=False)} AS bucket, c,
       {_MAVG} AS moving_avg
FROM framed ORDER BY event_type, bucket
"""


@plan("moving_average", oracle=_MAVG_ORACLE)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 6-bucket moving average over the hourly series. The raw
    scan partial-aggs to one row per (type, hour) BEFORE the window, so
    the frame walks ~10^4 post-agg rows regardless of event volume, and
    the window partitions on the series key (no single-partition
    global sort)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(-5, Window.currentRow)
    )
    return (
        hourly.withColumn("s", F.sum("c").over(w))
        .withColumn("cnt", F.count("c").over(w))
        .select(
            "event_type",
            fmt_ts(F.col("b"), micros=False).alias("bucket"),
            "c",
            F.expr(_MAVG).alias("moving_avg"),
        )
        .orderBy("event_type", "bucket")
    )


# --------------------------------------------------------------------------
# Ratio-to-report: each event type's share of its day's volume — the
# unordered partition-window aggregate (no frame, no sort), the one
# window shape the running/moving/ranking plans don't cover
# --------------------------------------------------------------------------

# c and day_total are exact BIGINTs; one shared double division.
_SHARE = f"{dround_sql('CAST(c AS DOUBLE) / day_total')}"

_SHARE_ORACLE = f"""
WITH daily AS (
  SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
         event_type, COUNT(*) AS c
  FROM events GROUP BY day, event_type
),
tot AS (
  SELECT *, SUM(c) OVER (PARTITION BY day) AS day_total FROM daily
)
SELECT day, event_type, c, {_SHARE} AS share
FROM tot ORDER BY day, event_type
"""


@plan("share_of_total", oracle=_SHARE_ORACLE)
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each type's share of its day: partial-agg to (day, type) counts
    first, then an unordered window sum partitioned on the day key over
    the ~10^2-rows-per-day post-agg table — never a sort, never a
    single partition, volume-independent window input."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("day")
    return (
        daily.withColumn("day_total", F.sum("c").over(w))
        .select("day", "event_type", "c", F.expr(_SHARE).alias("share"))
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# NTILE deciles: length distribution summary per language
# --------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH d AS (
  SELECT lang, n_chars,
         NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
SELECT lang, decile, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM d GROUP BY lang, decile ORDER BY lang, decile
"""


@plan("length_deciles", oracle=_DECILE_ORACLE)
def length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles via NTILE — the exact-rank profile of
    the length distribution (length_histogram is the fixed-bucket twin).
    The window partitions on the language stratum; doc_id breaks
    equal-length ties so tile assignment is deterministic. At 100 TB a
    skewed stratum makes exact NTILE a single-partition sort — the
    scale path swaps in approx_percentile cut points; kept exact here
    so the oracle hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "decile")
    )


# --------------------------------------------------------------------------
# PIVOT: daily event-type count matrix (long -> wide). The oracle uses
# conditional aggregation — the ANSI-portable PIVOT — so the pivoted
# column list is pinned by the shared constant, not inferred.
# --------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")

_PIVOT_ORACLE = f"""
SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _PIVOT_TYPES)}
FROM events
GROUP BY day ORDER BY day
"""


@plan("pivot_daily_counts", oracle=_PIVOT_ORACLE)
def pivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot: one row per day, one count column per event
    type. The type list is an explicit constant — passing values to
    ``pivot()`` skips Spark's extra distinct-discovery job AND pins
    the output schema (an inferred pivot can change schema when a new
    type appears, which no 100 TB pipeline wants). One scan, one
    partial-aggregated shuffle on the day key."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # Pivot leaves NULL where a (day, type) cell had no rows; the
    # conditional-aggregation oracle yields 0. Coalesce to match.
    return out.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _PIVOT_TYPES],
    ).orderBy("day")


# --------------------------------------------------------------------------
# UNPIVOT: wide quality features -> long (doc_id, metric, value) rows,
# the melt every metrics store ingests
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT doc_id, metric, value FROM (
  SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS DOUBLE) AS value FROM documents
  UNION ALL
  SELECT doc_id, 'n_tokens', CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text,
    '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS DOUBLE) FROM documents
)
ORDER BY doc_id, metric
"""


@plan("unpivot_metrics", oracle=_UNPIVOT_ORACLE)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt via native unpivot (Expand node: N output rows
    per input row in one pass, no self-union re-scan — the oracle's
    UNION ALL formulation would scan the table once per metric)."""
    docs = load_table(spark, sf_dir, "documents")
    from venus_spark.functions import tokens

    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(tokens("text")).cast("double").alias("n_tokens"),
    )
    return wide.unpivot(
        "doc_id", ["n_chars", "n_tokens"], "metric", "value"
    ).orderBy("doc_id", "metric")


# --------------------------------------------------------------------------
# Rank family: the four SQL ranking functions over one leaderboard —
# top users by total value per event type
# --------------------------------------------------------------------------

_RANK_K = 5

_RANK_ORACLE = f"""
WITH totals AS (
  SELECT event_type, user_id, {dsum_sql(dround_sql('value'))} AS total_value
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, user_id, total_value,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk,
         {dround_sql('PERCENT_RANK() OVER w')} AS prank,
         {dround_sql('CUME_DIST() OVER w')} AS cdist
  FROM totals
  WINDOW w AS (PARTITION BY event_type ORDER BY total_value DESC)
)
SELECT * FROM ranked WHERE rnk <= {_RANK_K}
ORDER BY event_type, rnk, user_id
"""


@plan("rank_leaderboard", oracle=_RANK_ORACLE)
def rank_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} users by total value per event type, carrying all four
    ranking functions (rank / dense_rank / percent_rank / cume_dist).
    The scan partial-aggs to one row per (type, user) before the
    window, and the window partitions on event_type over that bounded
    aggregate. Totals go through the decimal accumulator so the
    ordering key is bit-identical on both engines; rank semantics
    (not row_number) keep tied rows deterministic. percent_rank and
    cume_dist are exact integer-ratio divisions — identical IEEE
    results — rounded to 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        dsum(dround("value")).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("total_value").desc())
    return (
        totals.select(
            "event_type",
            "user_id",
            "total_value",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            dround(F.percent_rank().over(w)).alias("prank"),
            dround(F.cume_dist().over(w)).alias("cdist"),
        )
        .filter(F.col("rnk") <= _RANK_K)
        .orderBy("event_type", "rnk", "user_id")
    )


# --------------------------------------------------------------------------
# Event-path analysis: the first-3-events journey per user, ranked —
# the "what do users do first" behavioral query (funnel's free-form twin)
# --------------------------------------------------------------------------

_PATHS_TOPK = 20

_PATHS_ORACLE = f"""
WITH paths AS (
  SELECT ARRAY_TO_STRING(
           (LIST(event_type ORDER BY ts, event_id))[1:3], '>') AS path
  FROM events GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path
LIMIT {_PATHS_TOPK}
"""


@plan("event_paths", oracle=_PATHS_ORACLE)
def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-3-event paths across users: rank the journey prefixes
    by user count. One window (partitioned on the uniform user key) to
    order-and-truncate each user's stream, one groupBy on the path
    string, TakeOrderedAndProject for the top-k. The (ts, event_id)
    tiebreak makes the path deterministic under equal timestamps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(_PATHS_TOPK)
    )
