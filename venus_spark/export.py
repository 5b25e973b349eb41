"""Training-data export: the pipeline's LAST mile — materialize a
curated document set as deterministic, sharded JSONL, the interchange
format every LLM training stack ingests.

Reference tie-in: the reference's output side is PostgreSQL tables
consumed by Metabase (`/root/reference/README.rst:108-116`); a
training-data engine's output side is sharded text files consumed by a
data loader, so this module is that surface, Spark-first: one
distributed write, shard assignment by deterministic id hash (stable
across runs and cluster sizes — NOT round-robin, which depends on
partition layout), rows sorted within each shard so re-exports are
byte-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_jsonl(
    df: DataFrame,
    out_dir: str,
    shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write ``df`` as ``shards`` JSONL files under ``out_dir``.

    - Shard assignment is ``pmod(xxhash64(id), shards)`` — a pure
      function of the row id, so the same corpus exports to the same
      shard layout on any cluster, and a subset of the corpus keeps
      every surviving row in its original shard.
    - Each shard is an explicit ``_shard=<k>`` directory (a shard with
      no rows is simply absent) holding one file, rows sorted by id —
      byte-deterministic given the corpus, so re-exports diff clean.
    - Serialization is ``to_json(struct(*))`` (JVM-side, one pass); no
      data touches the driver.

    At 100 TB this is one shuffle + one write, shards sized to the
    loader's preferred file size by picking ``shards``."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    (
        df.withColumn("_shard", shard)
        # each shard value hashes to exactly one task, so each shard
        # directory receives exactly one sorted file
        .repartition(shards, F.col("_shard"))
        .sortWithinPartitions("_shard", id_col)
        .select(
            "_shard", F.to_json(F.struct(*df.columns)).alias("value")
        )
        .write.mode("error")
        .partitionBy("_shard")
        .text(out_dir)
    )


def export_curated_jsonl(
    spark: SparkSession, sf_dir: str, out_dir: str, shards: int = 8
) -> int:
    """Export the CURATED corpus (the ``curated_corpus`` funnel:
    quality gate ∧ not-near-dup ∧ not-benchmark-contaminated, MINUS any
    tombstoned documents — the funnel reads the unowned base table, so
    without the explicit anti-join a right-to-be-forgotten document
    would ride straight into the training hand-off) as sharded JSONL.
    Returns the number of documents exported.

    The returned count deliberately re-reads the written artifact (a
    line count over the text files, one narrow pass) so the number
    certifies the EXPORT, not the plan; at very large scale pass the
    certification cost on to the loader's own manifest check instead."""
    from venus_spark.plans.registry import all_plans
    from venus_spark.prepared import _anti_tombstones

    curated = _anti_tombstones(
        spark, sf_dir, all_plans()["curated_corpus"].fn(spark, sf_dir)
    )
    export_jsonl(curated, out_dir, shards)
    # count from the written artifact, certifying the export itself
    return spark.read.text(out_dir).count()
