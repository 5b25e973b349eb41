"""Streaming analytics operators: watermarked windowed aggregation,
gap-based session windows, and a custom stateful running-aggregate.

The reference has no late-data policy — any parseable ``created`` is
accepted regardless of age (reference ``venus/db/write.py:41-44`` is the
only time gate; SURVEY.md §2C). These operators are the north-star
extension for the metric/dashboard surface (B17) done properly for
streams: bounded state via watermarks, session windows, and an
``applyInPandasWithState`` example for semantics the built-ins lack.

Scale notes:
- Both windowed aggregates partial-aggregate map-side before the
  shuffle; keys are low-cardinality (window × event_type) or uniform
  (user_id), so AQE needs no skew handling.
- Watermarks bound state: closed windows/sessions are emitted once and
  evicted, so state is O(open windows), independent of stream length.
- Sessionization uses the built-in ``session_window`` — JVM state
  store, whole-stage codegen, no Python worker in the loop. A
  Pandas-state fold would put every event through Arrow+Python; the
  built-in merges sessions inside the state store. (The environment's
  ``applyInPandasWithState`` is also unreliable under timeout configs —
  Python workers crash in the timeout-evaluation path — so the custom
  stateful example below sticks to ``NoTimeout``, which is solid.)
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from venus_spark.functions import dsum


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event type (B17 for
    streams). Works identically on a batch DataFrame — the watermark is
    only attached to streaming input — so the batch oracle plan and the
    streaming query share this exact function."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows over (user_id, ts) events — the
    streaming twin of the batch ``sessionize_events`` plan, built on the
    native ``session_window`` operator (dynamic-gap merge inside the JVM
    state store; no Python in the hot path).

    In append mode a session row is emitted exactly once, when the
    watermark passes session end + gap. ``session_window.end`` is
    last-event-time + gap by definition, so ``session_end`` subtracts
    the gap back out to report the last event timestamp."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    gap = F.lit(f"{int(gap_seconds)} seconds")
    return (
        df.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            (F.col("sw.end") - F.make_dt_interval(secs=F.lit(float(gap_seconds)))).alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    event_key: str,
    dim_key: str,
) -> DataFrame:
    """Stream-static enrichment: left-join each event against a static
    dimension table (the logs⋈context shape, B15, applied to a live
    stream). The static side is broadcast — it is re-planned per
    micro-batch, so a dimension refresh (overwrite of the underlying
    table) is picked up on the next trigger without restarting the
    query. Stateless: unlike a stream-stream join there is no state
    store, so this composes freely under any output mode.

    The dimension-side key is dropped *by column reference* — dropping
    by name would remove BOTH sides' columns when the event key and
    dimension key share a name (e.g. both ``user_id``)."""
    return events.join(
        F.broadcast(dim), events[event_key] == dim[dim_key], "left"
    ).drop(dim[dim_key])


def join_views_to_clicks(
    views: DataFrame,
    clicks: DataFrame,
    max_delay_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each click attributed to
    the same user's views in the preceding ``max_delay_minutes``. Works
    identically on batch DataFrames (watermarks only attach to
    streaming input), so the batch twin of the same files is the test
    oracle.

    Scale/state posture: watermarks on BOTH sides plus the time-range
    join condition are what let the state store evict — a view row can
    be dropped once the watermark passes view_ts + max_delay, a click
    row as soon as its window closes. Without the interval conjunct
    the view-side state would grow without bound. The equality key
    (user_id) is uniform, so the symmetric hash join shuffles both
    streams on a well-distributed key."""
    v = views
    c = clicks
    if v.isStreaming:
        v = v.withWatermark("ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("ts", watermark)
    v = v.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    c = c.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (F.col("view_user") == F.col("click_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts")
            - F.make_dt_interval(mins=F.lit(int(max_delay_minutes)))
        )
    )
    return v.join(c, cond, "inner").select(
        "click_id", F.col("click_user").alias("user_id"), "click_ts", "view_id", "view_ts"
    )


RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _running_totals_group(
    key: Tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Arrow-batched per-user fold: lifetime event count and value sum,
    carried across micro-batches in the state store."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime running totals, updated every micro-batch (update output
    mode). This is the escape hatch for stateful semantics the built-in
    operators can't express; state is one tiny tuple per user, Arrow
    moves each batch in bulk."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _running_totals_group,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state_per_key(events: DataFrame) -> DataFrame:
    """Latest event per key as a streaming-capable AGGREGATION: MAX of
    the (ts, event_id, payload...) struct — lexicographic struct
    ordering picks the greatest (ts, event_id), and since that pair is
    unique the payload fields ride along without influencing the
    order. Unlike the row_number formulation (latest_event_state, the
    log-compaction batch job) this partial-aggregates map-side — every
    task forwards ONE candidate struct per key — and runs unchanged in
    streaming update mode, where the state store holds exactly one
    struct per key: the incrementally-maintained upsert 'current
    view'. Same rows either way; the two plans share one oracle."""
    top = F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m")
    return (
        events.groupBy("user_id")
        .agg(top)
        .select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_type").alias("last_type"),
            F.col("m.value").alias("last_value"),
        )
    )
