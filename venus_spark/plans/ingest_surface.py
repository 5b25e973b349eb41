"""Oracle-checked plan for the ingest transform chain (SURVEY.md §2A,
A4-A8): the *same* code path the streaming pipeline runs
(:func:`venus_spark.ingest.parse_records`), exercised as a batch plan
over the synthetic ``events`` table.

Shape: each event is rendered to a LogRecord-style JSON line
(``to_json``), then pushed through the real parse/extract/prune/
re-serialize chain, and the promoted columns plus residual-payload
fields are emitted. The DuckDB oracle computes the expected *values*
directly from ``events`` — so the JSON round-trip (A4 parse, A5
extraction+cast, A6 required-field filter, A7 pruning, A8 re-serialize)
is verified end-to-end against an implementation that never does it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from venus_spark.functions import fmt_ts
from venus_spark.functions.sqlgen import fmt_ts_sql
from venus_spark.ingest import good_records, log_record_schema, parse_records
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# events.user_id -> a deterministic synthetic UUID (valid canonical form).
_UUID_FMT = "00000000-0000-0000-0000-%012d"

_EXTRA_FIELDS = (
    ("event_id", T.LongType()),
    ("event_value", T.DoubleType()),
)

_INGEST_ORACLE = f"""
SELECT {fmt_ts_sql('ts')} AS time_str,
       event_type AS message,
       PRINTF('{_UUID_FMT}', user_id) AS correlation_id,
       event_id,
       value AS event_value,
       CAST(NULL AS VARCHAR) AS dropped_module
FROM events
"""


@plan("ingest_parse_logs", oracle=_INGEST_ORACLE)
def ingest_parse_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-A8 end-to-end on real data: render -> parse -> promote -> prune
    -> re-serialize. ``dropped_module`` proves A7 pruning: the field is
    present in the rendered record but must not survive into ``data``.

    Everything is built-in expressions (to_json/from_json/get_json_object)
    — one scan, zero shuffles, fully codegen'd.
    """
    ev = load_table(spark, sf_dir, "events", fanned=True)
    raw = ev.select(
        F.to_json(
            F.struct(
                # `created` is epoch seconds (double) like LogRecord.created;
                # ts is TIMESTAMP_NTZ and the session tz is UTC, so the
                # ltz hop is value-preserving; micros survive in a double
                # (2^52 ulp ≫ 1.7e15 µs).
                (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0)).alias(
                    "created"
                ),
                F.col("event_type").alias("message"),
                F.format_string(_UUID_FMT, "user_id").alias("correlation_id"),
                F.lit("events").alias("name"),
                F.lit("relay").alias("module"),  # in DROP_FIELDS -> pruned
                F.col("event_id").alias("event_id"),
                F.col("value").alias("event_value"),
            )
        ).alias("value")
    )
    schema = log_record_schema(_EXTRA_FIELDS)
    logs = good_records(parse_records(raw, schema=schema))
    # Parse the residual payload ONCE with from_json instead of one
    # get_json_object per field — each JsonPath call re-parses the whole
    # string (3 parses/row -> 1; measured 3.3 s -> 2.6 s at sf0.1).
    # Same lesson as the streaming sink's parse-at-INSERT VARIANT column.
    # Null-semantics note: from_json rejects a type-mismatched token
    # (e.g. a QUOTED number for a LongType field) where
    # get_json_object + cast would coerce it; safe here because `data`
    # is re-serialized by our own A8 step from typed columns, so field
    # types cannot drift. Free-form payloads should keep per-field
    # extraction or a permissive schema.
    data_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_value", T.DoubleType()),
            T.StructField("module", T.StringType()),
        ]
    )
    return logs.select(
        fmt_ts("time").alias("time_str"),
        "message",
        "correlation_id",
        F.from_json("data", data_schema).alias("d"),
    ).select(
        "time_str",
        "message",
        "correlation_id",
        F.col("d.event_id").alias("event_id"),
        F.col("d.event_value").alias("event_value"),
        F.col("d.module").alias("dropped_module"),
    )
