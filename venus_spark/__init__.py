"""venus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cjrh/venus (reference: /root/reference).

The reference is a centralised logging service (ZMQ ingest -> micro-batch
-> PostgreSQL/TimescaleDB) whose analytics surface is documented SQL over
four tables (logs, context, span, metric).  This package re-expresses:

- the ingest dataflow (reference venus/io/__init__.py, venus/db/write.py)
  as Structured Streaming transforms (:mod:`venus_spark.ingest`,
  :mod:`venus_spark.streaming`);
- the documented SQL query surface (reference README.rst:82-107,
  doc/json_tricks.rst) as DataFrame plans (:mod:`venus_spark.plans`);
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) in :mod:`venus_spark.operators`.

Everything is Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, with Pandas UDFs only where built-ins cannot express the
semantics.
"""

__version__ = "0.1.0"
