"""Ingest transforms: raw JSON log lines -> the ``logs`` table rows.

Re-expresses the reference's ingest dataflow (SURVEY.md §2A; reference
``venus/db/write.py:19-56``) as *pure* DataFrame->DataFrame functions so
the identical code path serves batch tests and Structured Streaming
(:mod:`venus_spark.streaming` wires these under a trigger).

Reference semantics reproduced:

- A4  JSON parse w/ error skip (``venus/db/write.py:31-36``) ->
  ``from_json`` PERMISSIVE; unparseable lines land in a quarantine
  DataFrame instead of a log-and-drop (strictly better observability,
  same ``logs`` contents).
- A5  field extraction + cast (``venus/db/write.py:41-47``):
  ``created`` epoch-float -> ``time`` timestamp, ``message``,
  ``correlation_id`` -> canonical lowercase UUID string.
- A6  required-field predicate (``venus/db/write.py:42-44``): rows with
  no parseable ``created`` never reach ``logs``.
- A7  ingest-time column pruning (``venus/db/write.py:65-67``, defaults
  ``venus/settings.py:26-37``): DROP_FIELDS removed from the payload.
- A8  re-serialize the residual payload to JSON (``venus/db/write.py:52``)
  into the ``data`` column.

Scale posture: everything here is built-in expressions (from_json /
to_json / timestamp_seconds) — whole-stage codegen, no Python in the
row path; the output is partitioned by ``date`` so the hypertable
chunk-pruning access path (reference migration :39-43) survives as
partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fields pruned at ingest time (reference venus/settings.py:26-37).
DROP_FIELDS = (
    "stack_info",
    "funcName",
    "created",
    "msecs",
    "module",
    "thread",
    "threadName",
    "processName",
)

# Promoted columns (reference migration 37716151a213:26-33): everything
# else stays inside the JSON payload.
PROMOTED = ("created", "message", "correlation_id")

# The canonical python LogRecord-as-JSON shape (reference README.rst:35-61)
# plus room for user `extra` fields declared by the caller — the same
# "need to know which names you're looking for" contract as
# jsonb_to_record (reference README.rst:92-100).
LOG_RECORD_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("name", T.StringType()),
    ("msg", T.StringType()),
    ("levelname", T.StringType()),
    ("levelno", T.IntegerType()),
    ("pathname", T.StringType()),
    ("filename", T.StringType()),
    ("module", T.StringType()),
    ("exc_text", T.StringType()),
    ("stack_info", T.StringType()),
    ("lineno", T.IntegerType()),
    ("funcName", T.StringType()),
    ("created", T.DoubleType()),
    ("msecs", T.DoubleType()),
    ("relativeCreated", T.DoubleType()),
    ("thread", T.LongType()),
    ("threadName", T.StringType()),
    ("processName", T.StringType()),
    ("process", T.LongType()),
    ("correlation_id", T.StringType()),
    ("message", T.StringType()),
    ("created_iso", T.StringType()),
)


def log_record_schema(
    extra_fields: tuple[tuple[str, T.DataType], ...] = (),
) -> T.StructType:
    """Declared-schema for ``from_json`` over a LogRecord JSON line.

    ``extra_fields`` is the caller's `extra` declaration (e.g.
    ``(("random_timing_data", DoubleType()),)`` per reference
    README.rst:58); undeclared extras are simply not materialized —
    identical to the jsonb_to_record contract.
    """
    return T.StructType(
        [T.StructField(n, t) for n, t in (*LOG_RECORD_FIELDS, *extra_fields)]
    )


LOGS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("message", T.StringType()),
        T.StructField("correlation_id", T.StringType()),
        T.StructField("data", T.StringType(), False),
    ]
)

_UUID_RE = r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"


def canonical_uuid(col: Column) -> Column:
    """Lowercase-canonical UUID string or NULL if malformed.

    The reference parses with ``UUID()`` (venus/db/write.py:47), which
    accepts mixed case and yields lowercase; Spark has no UUID type so we
    normalize + validate with a regexp.
    """
    low = F.lower(F.trim(col))
    return F.when(low.rlike(_UUID_RE), low)


# Output columns parse_records/good_records emit besides the promoted
# set — a promoted field reusing one of these names would be silently
# overwritten (_batch_id, by the sink writer) or duplicated (the rest).
RESERVED_OUTPUT_COLUMNS = (
    "time", "data", "date", "_ok", "_raw", "_batch_id", "data_v"
)


def validate_promote(
    schema: T.StructType, promote: tuple[str, ...]
) -> list[str]:
    """Shared promote validation (review r11 pass-4 #3 — ONE copy for
    parse_records and start_logs_ingest so fail-at-start and
    fail-at-parse can never drift): dedup-preserving-order, reject
    names absent from the declared record schema, reject collisions
    with the fixed output columns. Returns the deduped extra-promote
    list (built-in PROMOTED names excluded — promoting those is a
    no-op, they are always promoted)."""
    extra = list(dict.fromkeys(p for p in promote if p not in PROMOTED))
    known = {f.name for f in schema.fields}
    missing = [p for p in extra if p not in known]
    if missing:
        raise ValueError(
            f"promote names absent from the record schema: {missing} — "
            "declare them (log_record_schema(extra_fields=...)) first"
        )
    reserved = [p for p in extra if p in RESERVED_OUTPUT_COLUMNS]
    if reserved:
        raise ValueError(
            f"promote names collide with fixed output columns: {reserved}"
        )
    return extra


def parse_records(
    raw: DataFrame,
    raw_col: str = "value",
    schema: T.StructType | None = None,
    drop_fields: tuple[str, ...] | None = None,
    promote: tuple[str, ...] = (),
) -> DataFrame:
    """Raw JSON-line DataFrame -> parsed rows with an ``_ok`` marker.

    Output columns: ``time, message, correlation_id, <promote...>,
    data, date, _ok, _raw``. ``_ok = false`` rows (unparseable JSON or
    missing ``created``) are the quarantine set — the reference
    logs-and-drops them (venus/db/write.py:34-36,42-44); we keep the
    raw line.

    ``drop_fields`` overrides the module-constant DROP_FIELDS — the
    streaming path passes the *live* value per micro-batch
    (venus_spark.live_config, the A14 analog), so a config change
    applies at the next trigger without restarting the query.

    ``promote`` is the SCHEMA-EVOLUTION hook (VERDICT r10 #4 — the
    alembic-migration analog: the reference promotes payload fields to
    real columns by migration, e.g. migration 37716151a213:26-33 is rev
    1 of that series): each named record field becomes a top-level
    column AND is popped from the residual ``data`` payload, exactly
    like the three built-in PROMOTED fields. Batches written before the
    promotion simply lack the column — the read contract
    (:func:`venus_spark.streaming.read_logs_table`, mergeSchema) NULL-
    fills them, which is also what a warehouse ALTER TABLE ADD COLUMN
    leaves in old rows.
    """
    schema = schema or log_record_schema()
    drop = DROP_FIELDS if drop_fields is None else tuple(drop_fields)
    rec = F.from_json(F.col(raw_col), schema)
    # The three PROMOTED fields are popped from the payload
    # unconditionally (reference extract_safe, venus/db/write.py:87-91)
    # — independent of the live drop_fields override, which would
    # otherwise leak `created` into data whenever a config omits it.
    extra = validate_promote(schema, promote)
    promoted = PROMOTED + tuple(extra)
    residual = [f.name for f in schema.fields if f.name not in drop + promoted]
    return (
        raw.withColumn("_rec", rec)
        .select(
            F.timestamp_seconds(F.col("_rec.created")).alias("time"),
            F.col("_rec.message").alias("message"),
            canonical_uuid(F.col("_rec.correlation_id")).alias("correlation_id"),
            *[F.col(f"_rec.{c}").alias(c) for c in extra],
            # A7+A8: the payload loses DROP_FIELDS (pruned) and the
            # promoted fields (the reference's extract_safe *pops* them,
            # venus/db/write.py:87-91); everything else re-serializes.
            F.to_json(F.struct(*[F.col(f"_rec.{c}").alias(c) for c in residual])).alias(
                "data"
            ),
            F.col("_rec.created").isNotNull().alias("_ok"),
            F.col(raw_col).alias("_raw"),
        )
        .withColumn("date", F.to_date("time"))
    )


def good_records(parsed: DataFrame) -> DataFrame:
    """The rows that enter ``logs`` (A6 filter applied), in table schema
    plus the ``date`` partition column.

    ``data_v`` is the payload parsed ONCE at ingest into Spark 4
    ``VARIANT`` — the JSONB-at-INSERT-time analog (SURVEY §1.4): queries
    read ``variant_get(data_v, ...)`` with parquet shredding pushing the
    probed keys into the read schema, instead of JsonPath over text per
    row per query. The JSON string rides along because the DuckDB
    oracle (and any non-Spark reader) cannot decode Spark's variant
    encoding; a pure-Spark deployment at 100 TB stores only ``data_v``
    (the reference likewise stores only JSONB, never the raw text).

    Column list follows the parse output, so extra PROMOTED columns
    (schema evolution, ``parse_records(promote=...)``) flow into the
    table between ``correlation_id`` and ``data``."""
    head = [
        c for c in parsed.columns if c not in ("data", "_ok", "_raw", "date")
    ]
    return parsed.filter(F.col("_ok")).select(
        *head,
        "data",
        F.parse_json("data").alias("data_v"),
        "date",
    )


def quarantined_records(parsed: DataFrame) -> DataFrame:
    """Rows the reference would log-and-drop: kept with their raw line."""
    return parsed.filter(~F.col("_ok") | F.col("_ok").isNull()).select(
        F.col("_raw").alias("raw")
    )


# --------------------------------------------------------------------------
# Aux tables (reference migration 37716151a213:45-78): context, span,
# metric. Same parse/quarantine split as logs; metric is date-partitioned
# like logs (both are hypertables in the reference, migration :39-43,74-78).
# --------------------------------------------------------------------------

CONTEXT_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("correlation_id", T.StringType(), False),
        T.StructField("data", T.StringType(), False),
    ]
)

SPAN_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("span_id", T.StringType(), False),
        T.StructField("correlation_id", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("time_start", T.TimestampType(), False),
        T.StructField("time_end", T.TimestampType(), False),
    ]
)

METRIC_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("data", T.StringType(), False),
    ]
)


def parse_context(raw: DataFrame, raw_col: str = "value") -> DataFrame:
    """Context records: ``{"correlation_id": uuid, ...}`` — the request-
    scoped dimension row (reference migration :45-52). The whole payload
    minus the key is re-serialized into ``data``; rows without a valid
    correlation_id (the PK) quarantine."""
    rec = F.from_json(F.col(raw_col), "correlation_id string")
    # Payload = the raw object minus the promoted key; parsing the raw
    # line as a map keeps caller-defined fields without a declared schema
    # (context data is schemaless JSONB in the reference). VARIANT values
    # keep JSON types intact through the re-serialization — {"cpu":0.5}
    # stays a number and nested objects stay objects, like the reference's
    # json.dumps(parsed_dict) (venus/db/write.py). Types match, but nested
    # object key order is canonicalized (variant sorts keys), so the data
    # string is not byte-identical to the reference for nested objects —
    # fine for every JSON-path consumer, not for byte-level diffs.
    payload = F.from_json(F.col(raw_col), "map<string,variant>")
    cid = canonical_uuid(rec["correlation_id"])
    return raw.select(
        cid.alias("correlation_id"),
        F.to_json(F.map_filter(payload, lambda k, _: k != "correlation_id")).alias(
            "data"
        ),
        cid.isNotNull().alias("_ok"),
        F.col(raw_col).alias("_raw"),
    )


def parse_span(raw: DataFrame, raw_col: str = "value") -> DataFrame:
    """Span records (reference migration :54-64): interval rows keyed by
    span_id with epoch-second bounds. Rows lacking a valid span_id or
    either bound quarantine (both bounds are NOT NULL in the reference
    schema)."""
    schema = (
        "span_id string, correlation_id string, description string, "
        "time_start double, time_end double"
    )
    rec = F.from_json(F.col(raw_col), schema)
    sid = canonical_uuid(rec["span_id"])
    t0 = F.timestamp_seconds(rec["time_start"])
    t1 = F.timestamp_seconds(rec["time_end"])
    return raw.select(
        sid.alias("span_id"),
        canonical_uuid(rec["correlation_id"]).alias("correlation_id"),
        rec["description"].alias("description"),
        t0.alias("time_start"),
        t1.alias("time_end"),
        (sid.isNotNull() & t0.isNotNull() & t1.isNotNull()).alias("_ok"),
        F.col(raw_col).alias("_raw"),
    )


def parse_metric(raw: DataFrame, raw_col: str = "value") -> DataFrame:
    """Metric records (reference migration :66-78): epoch ``time`` +
    schemaless payload, date-partitioned like logs."""
    rec = F.from_json(F.col(raw_col), "time double")
    # VARIANT values: payload numbers/booleans/nested objects survive the
    # strip-and-reserialize with their JSON types (see parse_context).
    payload = F.from_json(F.col(raw_col), "map<string,variant>")
    t = F.timestamp_seconds(rec["time"])
    return raw.select(
        t.alias("time"),
        F.to_json(F.map_filter(payload, lambda k, _: k != "time")).alias("data"),
        t.isNotNull().alias("_ok"),
        F.col(raw_col).alias("_raw"),
    ).withColumn("date", F.to_date("time"))
