"""Large-scale training-data pipeline operators — extensions beyond the
reference surface (SURVEY.md §7.2.5): deduplication, similarity search,
text analysis, multimodal columns.

Every operator is a pure DataFrame -> DataFrame transform built from
pyspark.sql.functions (JVM-side) unless the semantics genuinely require
Python, in which case it's an Arrow-batched Pandas UDF.
"""
