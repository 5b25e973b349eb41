"""Training-data pipeline plans: behavioral analytics over the event
stream — conversion funnels, retention cohorts, and (from the later
waves) gap statistics, anomaly flags, point lookups over clustered
layouts, smoothing, and per-type trends.

(Moved verbatim from the accreted pipeline_ops6/7/9/10/11 modules in
the r14 domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum, dround, fmt_ts
from venus_spark.functions.sqlgen import (
    davg_sql,
    double_lit_sql,
    dround_sql,
    dsum_sql,
    fmt_ts_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Behavioral funnel over the event stream
# --------------------------------------------------------------------------

_FUNNEL = ("view", "click", "purchase")

_FUNNEL_ORACLE = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = '{_FUNNEL[1]}' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = '{_FUNNEL[2]}' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_stage1,
       (SELECT COUNT(*) FROM s2) AS n_stage2,
       (SELECT COUNT(*) FROM s3) AS n_stage3
"""


@plan("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-stage funnel (view -> click -> purchase):
    users counted at stage n+1 only for events after their first
    stage-n event.

    Scale shape: each stage is a hash aggregate keyed on user_id; all
    three stages and both joins share the same shuffle key, so after
    the first exchange the join/agg chain stays co-partitioned (no
    re-shuffle). Window-free — no per-user event ordering is
    materialized, only MIN(ts) partial aggregates.
    """
    events = load_table(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None, tcol: str) -> DataFrame:
        e = events.filter(F.col("event_type") == etype)
        if prev is not None:
            prev_t = prev.columns[-1]
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = stage(_FUNNEL[0], None, "t1")
    s2 = stage(_FUNNEL[1], s1, "t2")
    s3 = stage(_FUNNEL[2], s2, "t3")
    return (
        s1.agg(F.count("*").alias("n_stage1"))
        .join(s2.agg(F.count("*").alias("n_stage2")))
        .join(s3.agg(F.count("*").alias("n_stage3")))
    )


# --------------------------------------------------------------------------
# Retention cohorts
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT STRFTIME(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(DATE_DIFF('day', c.cohort_day, a.active_day) AS INT) AS day_offset,
       COUNT(*) AS n_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@plan("retention_cohorts", oracle=_RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle: users bucketed by first-seen
    day, counted on each subsequent active day.

    Scale shape: cohort assignment and the (user, day) de-dup are both
    hash aggregates on user_id (same key -> co-partitioned join, one
    exchange); the final rollup groups on (cohort_day, day_offset)
    whose cardinality is O(days^2) — trivially small however large the
    event table. Output days are canonical strings (oracle-stable).
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("active_day")
    )
    cohort = events.groupBy("user_id").agg(
        F.min("active_day").alias("cohort_day")
    )
    active = events.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )




# --------------------------------------------------------------------------
# Event inter-arrival gaps: lag() over per-user event streams, rolled up
# per event type — the "how bursty is this signal" query, and the B17
# family's lead/lag coverage.
# --------------------------------------------------------------------------

# Gap in integer microseconds (exact on both engines), rendered to
# seconds through one shared rounding expression.
_GAP_S = f"{dround_sql('gap_us / CAST(1000000 AS DOUBLE)')}"

_GAPS_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       {davg_sql(_GAP_S)} AS avg_gap_s,
       MAX({_GAP_S}) AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@plan("event_gap_stats", oracle=_GAPS_ORACLE)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival statistics: lag(ts) over (partition by
    user order by ts, event_id) — the window partitions on the uniform
    user key, so no single partition ever exceeds one user's history;
    the rollup after it is a tiny groupBy. Gaps are computed in exact
    integer microseconds and converted once, so both engines round the
    identical quotient. The event_id tiebreak makes lag() well-defined
    under equal timestamps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in parquet; the session tz is UTC so the cast
    # is value-preserving and matches DuckDB's naive EPOCH_US.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.select(
            "event_type", (us - F.lag(us).over(w)).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
        .withColumn("gap_s", F.expr(_GAP_S))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            davg("gap_s").alias("avg_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )




# --------------------------------------------------------------------------
# Z-score anomaly ranking: hourly counts per event type scored against
# that type's own mean/stddev, top-3 most anomalous buckets per type —
# the alerting query a logging service runs over its hypertable
# (reference surface: README.rst:82-107 time-bucketed aggregates).
# --------------------------------------------------------------------------

_ANOM_TOPK = 3

# Welford-free variance from exact integer aggregates: n, s1 = sum(c),
# s2 = sum(c*c) are all BIGINT-exact, so the double expression below is
# the identical tree on both engines.
# CAST AS DOUBLE, not `* 1.0`: an exact-numeric literal parses as
# DECIMAL on both engines and their decimal division scale rules
# differ (measured: a 6dp-boundary z diverged); the cast keeps every
# op in IEEE double where the engines agree bit-for-bit. The CASE
# guard matters under Spark's default ANSI mode, where a one-bucket or
# zero-variance series would make the division a runtime ERROR, not a
# NULL (the guard compares in double so it cannot overflow at scale).
_Z_RAW = (
    "(c - CAST(s1 AS DOUBLE) / n)"
    " / SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))"
)
_Z_SCORE = (
    "CASE WHEN n > 1 AND CAST(s2 AS DOUBLE) * n > CAST(s1 AS DOUBLE) * s1 THEN "
    + dround_sql(_Z_RAW)
    + " ELSE CAST(NULL AS DOUBLE) END"
)

_ANOM_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS b, COUNT(*) AS c
  FROM events GROUP BY event_type, b
),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
  FROM hourly GROUP BY event_type
),
z AS (
  SELECT hourly.event_type, b, c, {_Z_SCORE} AS z
  FROM hourly JOIN stats USING (event_type)
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY ABS(z) DESC NULLS LAST, b) AS rn
  FROM z
)
SELECT event_type, {fmt_ts_sql('b', micros=False)} AS bucket, c, z
FROM r WHERE rn <= {_ANOM_TOPK}
ORDER BY event_type, bucket
"""


@plan("timeseries_anomaly", oracle=_ANOM_ORACLE)
def timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most anomalous hours per event type by |z| against the
    type's own hourly-count distribution. The raw scan partial-aggs to
    one row per (type, hour) before anything else happens, so the
    window and the stats join both run over data bounded by the time
    range, not the event volume — at 100 TB the post-agg table is the
    same ~10^4 rows it is here. Stats come from exact integer sums
    (no float accumulation order); the stats side is broadcast."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(F.count("*").alias("c"))
    # hourly feeds both the stats aggregate and the z-score probe; the
    # lazy checkpoint stops the events scan + hourly agg from running
    # twice (r15) — it materializes inside the broadcast-stats job.
    from venus_spark.lineage import ckpt

    hourly = ckpt(hourly)
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
    )
    z = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "z", F.expr(_Z_SCORE)
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("z")).desc_nulls_last(), F.col("b")
    )
    return (
        z.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ANOM_TOPK)
        .select(
            "event_type",
            fmt_ts(F.col("b"), micros=False).alias("bucket"),
            "c",
            "z",
        )
        .orderBy("event_type", "bucket")
    )




# --------------------------------------------------------------------------
# 2-D point-in-time lookup: correlation key AND time window, plain scan
# vs the Z-order clustered layout.
# --------------------------------------------------------------------------

_L2D_KEY = 13
_L2D_T0, _L2D_T1 = "2024-01-10 00:00:00", "2024-01-13 00:00:00"

_L2D_ORACLE = f"""
SELECT event_id, {fmt_ts_sql('ts')} AS ts_str, event_type,
       value AS event_value
FROM events
WHERE user_id = {_L2D_KEY}
  AND ts >= TIMESTAMP '{_L2D_T0}' AND ts < TIMESTAMP '{_L2D_T1}'
"""


def _lookup_2d(ev: DataFrame) -> DataFrame:
    from venus_spark.plans.venus_surface import _ts

    return ev.filter(
        (F.col("user_id") == _L2D_KEY)
        & (F.col("ts") >= _ts(_L2D_T0))
        & (F.col("ts") < _ts(_L2D_T1))
    ).select(
        "event_id",
        fmt_ts("ts").alias("ts_str"),
        "event_type",
        F.col("value").alias("event_value"),
    )


@plan("lookup_2d", oracle=_L2D_ORACLE)
def lookup_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary pattern with its hypertable constraint
    attached: correlation-key probe AND time window (README.rst:73-74;
    the migration's 1-day chunks exist for exactly this shape). Plain
    full scan — the baseline twin of lookup_2d_zorder; both predicates
    are pushed to the parquet reader but an unclustered layout gives
    the row-group stats nothing to prune on."""
    return _lookup_2d(load_table(spark, sf_dir, "events"))


@plan("lookup_2d_zorder", oracle=_L2D_ORACLE)
def lookup_2d_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 2-D probe served from the Z-order clustered layout
    (prepared.events_zorder): every file covers a small rectangle of
    (user_id, hour) space, so the pushed min/max filters prune on BOTH
    dimensions — the multi-dimensional answer where the 1-D layouts
    (events_by_user, events_by_date) each serve only their own
    predicate. tests/test_prepared.py asserts the footer-stats
    prunability of all three layouts against both probe shapes. Same
    rows, same oracle."""
    from venus_spark.prepared import events_zorder

    return _lookup_2d(events_zorder(spark, sf_dir))




# --------------------------------------------------------------------------
# EWMA smoothing of the hourly event series.
# --------------------------------------------------------------------------

_EWMA_A = 0.3

# the ONE (type, hour, avg value) series definition, shared with
# series_correlation (analytics_ext4) in both engines
_HOURLY_SERIES_SQL = f"""SELECT event_type, DATE_TRUNC('hour', ts) AS h, {davg_sql('value')} AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, DATE_TRUNC('hour', ts)"""


def hourly_value_series(ev: DataFrame) -> DataFrame:
    """Hourly per-type value series (non-NULL values, exact decimal
    mean) — the Spark twin of ``_HOURLY_SERIES_SQL``, shared by the
    EWMA and correlation plans so the series definition cannot
    drift between them."""
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(davg("value").alias("v"))
    )


def _ewma_oracle() -> str:
    from venus_spark.functions.sqlgen import ewma_fold_sql

    return f"""
WITH hourly AS (
  {_HOURLY_SERIES_SQL}
),
series AS (
  SELECT event_type, h, v,
         LIST(v) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS arr
  FROM hourly
)
SELECT event_type, {fmt_ts_sql('h', micros=False)} AS hour,
       v AS hourly_avg,
       {dround_sql(f'''{ewma_fold_sql('arr', _EWMA_A)}''')} AS ewma
FROM series
"""


_EWMA_ORACLE = _ewma_oracle()


@plan("ewma_smoothing", oracle=_EWMA_ORACLE)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per event type over the
    hourly series: ewma_i = α·x_i + (1-α)·ewma_{i-1}, seeded with the
    first observation — the smoothed dashboard trend feeding the
    anomaly view (timeseries_anomaly is the z-score twin; M4 is the
    decimator). The recursion is a left fold over the hour-ordered
    prefix (collect_list over a running window), identical
    IEEE-double step order on both engines (seed = first element, per
    DuckDB LIST_REDUCE). Prefix arrays are quadratic in SERIES length,
    which is bounded by the time range (720 buckets here), never by
    corpus size — the same bounded-cardinality posture as gapfill/LOCF;
    row volume collapses to one row per (type, hour) at the partial
    agg before any window runs."""
    from venus_spark.functions import ewma_fold

    hourly = hourly_value_series(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list("v").over(w)
    ewma = ewma_fold(arr, _EWMA_A)
    return hourly.select(
        "event_type",
        fmt_ts(F.col("h"), micros=False).alias("hour"),
        F.col("v").alias("hourly_avg"),
        dround(ewma).alias("ewma"),
    )


# --------------------------------------------------------------------------
# Session duration distribution
# --------------------------------------------------------------------------

_SDP_GAP = 1800

_SDP_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts >= LAG(ts) OVER w + INTERVAL {_SDP_GAP} SECONDS
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
durations AS (
  SELECT (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) / {double_lit_sql(1e6)}
           AS dur_sec
  FROM sess GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_sessions,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.25)')} AS p25,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.50)')} AS p50,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.75)')} AS p75,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.90)')} AS p90
FROM durations
"""


@plan("session_duration_percentiles", oracle=_SDP_ORACLE)
def session_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session lengths: the shared session operator
    (streaming.windows.sessionize_stream — native session_window, the
    same 30-min ≥-gap rule session_window_stats certifies; note
    sessionize_events is a DIFFERENT dashboard with its own 60-min
    strict gap), each session's first-to-last span in seconds, then
    exact interpolated percentiles — the engagement-health tile next
    to DAU/stickiness on any product dashboard. The oracle recomputes
    the sessions through the independent lag+cumsum formulation, so
    this plan re-certifies the operator while measuring durations.
    Sessionization partial-aggregates per user; the percentile runs
    over one row per session (orders of magnitude below event volume);
    at 100 TB the drop-in is approx_percentile, kept exact here for
    the oracle hash (same policy as value_percentiles)."""
    from venus_spark.streaming.windows import sessionize_stream

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize_stream(ev, gap_seconds=_SDP_GAP)
    dur = (
        F.unix_micros(F.col("session_end").cast("timestamp"))
        - F.unix_micros(F.col("session_start").cast("timestamp"))
    ) / F.lit(1e6)
    durations = sessions.select(dur.alias("dur_sec"))
    return durations.agg(
        F.count("*").alias("n_sessions"),
        *[
            dround(F.percentile("dur_sec", F.lit(q))).alias(
                f"p{int(q * 100)}"
            )
            for q in (0.25, 0.50, 0.75, 0.90)
        ],
    )


# --------------------------------------------------------------------------
# Per-group linear trend (exact-parity ordinary least squares)
# --------------------------------------------------------------------------

# Day zero of the event window; integer microseconds so the centering
# subtraction below is exact BIGINT arithmetic in both engines.
_TREND_T0_US = 1704067200000000  # 2024-01-01 00:00:00 UTC
_US_PER_DAY = "86400000000.0"

# Shared per-row centered terms: x_us0/xbar_us/y/ybar are all either
# BIGINT or canonical doubles, so the arithmetic is bit-deterministic;
# ROUND(...,6) makes each term exactly representable for dsum.
_TREND_XC = f"((CAST(x_us0 AS DOUBLE) - xbar_us) / {_US_PER_DAY})"
_TREND_YC = "(y - ybar)"
_TREND_T_XY = f"{dround_sql(f'{_TREND_XC} * {_TREND_YC}')}"
_TREND_T_XX = f"{dround_sql(f'{_TREND_XC} * {_TREND_XC}')}"
_TREND_T_YY = f"{dround_sql(f'{_TREND_YC} * {_TREND_YC}')}"

# Final projections over the exact aggregates (sxy/sxx/syy canonical
# doubles from dsum; xbar_us/ybar canonical from davg).
_TREND_SLOPE = f"CASE WHEN sxx > 0 THEN {dround_sql('sxy / sxx')} END"
_TREND_INTERCEPT = (
    f"CASE WHEN sxx > 0 THEN "
    f"{dround_sql(f'ybar - (sxy / sxx) * (xbar_us / {_US_PER_DAY})')} END"
)
_TREND_R2 = (
    f"CASE WHEN sxx * syy > 0 THEN {dround_sql('(sxy * sxy) / (sxx * syy)')} END"
)

_TREND_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         EPOCH_US(ts) - {_TREND_T0_US} AS x_us0,
         {dround_sql('value')} AS y
  FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         {davg_sql('x_us0')} AS xbar_us,
         {davg_sql('y')} AS ybar
  FROM ev GROUP BY event_type
),
terms AS (
  SELECT ev.event_type,
         {_TREND_T_XY} AS t_xy,
         {_TREND_T_XX} AS t_xx,
         {_TREND_T_YY} AS t_yy
  FROM ev JOIN stats USING (event_type)
),
agg AS (
  SELECT event_type,
         {dsum_sql('t_xy')} AS sxy,
         {dsum_sql('t_xx')} AS sxx,
         {dsum_sql('t_yy')} AS syy
  FROM terms GROUP BY event_type
)
SELECT s.event_type, s.n,
       {_TREND_SLOPE} AS slope_per_day,
       {_TREND_INTERCEPT} AS intercept,
       {_TREND_R2} AS r2
FROM agg a JOIN stats s USING (event_type)
ORDER BY s.event_type
"""


@plan("value_trend_per_type", oracle=_TREND_ORACLE)
def value_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of value over time (OLS slope,
    intercept at the window origin, R²) — the drift/trend tile of any
    metrics dashboard, computed under the repo's exact-parity
    discipline: timestamps center as exact BIGINT microseconds, the
    centered per-row terms are rounded then summed through the decimal
    accumulator (summation order cannot matter), and the closing
    slope/R² divisions are single deterministic double ops. The same
    numbers as SQL's REGR_SLOPE/REGR_R2 family, which both engines
    implement over order-dependent double sums and therefore cannot be
    value-hashed across engines.

    Scale shape: two corpus scans (the mean pass and the term pass),
    both partial-aggregating on event_type; the stats join is a
    broadcast of one row per group. At 100 TB the second scan reuses
    the first's shuffle partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(_TREND_T0_US)
        ).alias("x_us0"),
        dround("value").alias("y"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        davg("x_us0").alias("xbar_us"),
        davg("y").alias("ybar"),
    )
    terms = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.expr(_TREND_T_XY).alias("t_xy"),
        F.expr(_TREND_T_XX).alias("t_xx"),
        F.expr(_TREND_T_YY).alias("t_yy"),
    )
    agg = terms.groupBy("event_type").agg(
        dsum("t_xy").alias("sxy"),
        dsum("t_xx").alias("sxx"),
        dsum("t_yy").alias("syy"),
    )
    return (
        agg.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "n",
            F.expr(_TREND_SLOPE).alias("slope_per_day"),
            F.expr(_TREND_INTERCEPT).alias("intercept"),
            F.expr(_TREND_R2).alias("r2"),
        )
        .orderBy("event_type")
    )


