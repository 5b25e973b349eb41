"""VariantType twins of the JSONB surface (SURVEY §1.4).

The reference serves ``data->>'k'`` / ``data @> …`` from a JSONB column
backed by GIN indexes (README.rst:105-107; migration
37716151a213_initialise_database.py:37,52,73). SURVEY §1.4 names Spark
4's ``VariantType`` as the primary JSONB mapping; the text-JSON plans in
``venus_surface.py`` (``json_field_access``, ``json_containment``) keep
the oracle-friendly per-query ``get_json_object`` path, while these
twins serve the SAME results from the prepared ``events_variant`` table
where the payload was ``parse_json``-ed ONCE at ingest time.

Why this matters at 100 TB: each ``get_json_object`` call re-parses the
text payload per row per query. A stored variant is a decoded binary
encoding, and Spark's parquet writer *shreds* it — ``variant_get``
fields appear in the scan's ``ReadSchema`` as typed subcolumns
(asserted by ``tests/test_plan_shapes.py``), so probing two keys of a
50-key payload decodes two subcolumns, not the whole document. That is
the columnar analog of the reference's GIN-served key access.

The oracles are identical to the text twins' (DuckDB sees the same
parquet ``events`` table; variant storage is a Spark-side layout
choice, invisible to the result contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import fmt_ts
from venus_spark.functions.sqlgen import fmt_ts_sql
from venus_spark.plans.registry import plan

_VARIANT_ACCESS_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       COUNT(*) AS n
FROM events
GROUP BY k_val
"""


@plan("json_field_access_variant", oracle=_VARIANT_ACCESS_ORACLE)
def json_field_access_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B4 from stored VARIANT: ``variant_get(props_v, '$.k')`` over
    the ingest-time-parsed payload — same grouped count as
    ``json_field_access``, no per-query JsonPath over text."""
    from venus_spark.prepared import events_variant

    ev = events_variant(spark, sf_dir)
    return (
        ev.select(F.variant_get("props_v", "$.k", "int").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count("*").alias("n"))
    )


_VARIANT_CONTAIN_ORACLE = f"""
WITH logs AS (
  SELECT event_id, user_id, ts,
         json_object('k', CAST(json_extract_string(props, '$.k') AS INTEGER),
                     'type', event_type,
                     'uid', CASE WHEN user_id % 3 <> 0 THEN user_id END) AS data
  FROM events
)
SELECT event_id, user_id, {fmt_ts_sql('ts')} AS ts_str
FROM logs
WHERE CAST(json_extract_string(data, '$.k') AS INTEGER) = 7
  AND json_extract_string(data, '$.type') = 'click'
  AND json_extract_string(data, '$.uid') IS NOT NULL
"""


@plan("json_containment_variant", oracle=_VARIANT_CONTAIN_ORACLE)
def json_containment_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 from stored VARIANT: the ``data @> '{"k":7,"type":"click"}'``
    conjunction plus the ``data ? 'uid'`` existence probe, evaluated
    with ``variant_get`` over the prepared multi-key document
    (``data_v``). Missing keys yield NULL exactly like the JsonPath
    path, so containment/existence semantics are unchanged — only the
    per-row parse is gone."""
    from venus_spark.prepared import events_variant

    ev = events_variant(spark, sf_dir)
    return ev.filter(
        (F.variant_get("data_v", "$.k", "int") == 7)
        & (F.variant_get("data_v", "$.type", "string") == "click")
        & F.variant_get("data_v", "$.uid", "long").isNotNull()
    ).select("event_id", "user_id", fmt_ts("ts").alias("ts_str"))


_VARIANT_RECORDIZE_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""


@plan("json_recordize_variant", oracle=_VARIANT_RECORDIZE_ORACLE)
def json_recordize_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 (jsonb_to_record) from stored VARIANT — completes the variant
    trio (scalar access, containment, record-ize): the typed record
    column comes off the shredded variant subcolumn in the scan, so
    record-izing is a projection, not a parse. Same oracle as
    json_recordize: the storage changes the access path, not the
    answer."""
    from venus_spark.prepared import events_variant

    ev = events_variant(spark, sf_dir)
    return ev.select(
        "event_id", F.variant_get("props_v", "$.k", "int").alias("k")
    )
