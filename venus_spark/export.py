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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXPORT_MANIFEST = "_export_manifest.json"


def _shard_digests(spark: SparkSession, out_dir: str) -> dict:
    """Per-shard (rows, order-independent xxhash64 XOR) recomputed from
    the written text files — one narrow pass; partition discovery
    recovers the ``_shard`` column from the directory layout. XOR (not
    SUM) folds the line hashes: order-independent like the export's
    byte-determinism demands, and overflow-free under Spark 4's default
    ANSI mode (a long SUM would raise on wrap). Digest posture (review
    r8 pass-7 #3): XOR cancels EVEN multiplicities, so the manifest
    certifies against accidental damage (truncation, loss, partial
    copies — the rsync/object-store threat it exists for), not against
    an adversary forging equal-XOR line sets; a paranoid hand-off adds
    a cryptographic whole-file digest downstream. The path's cached
    plan/file state is refreshed first — purely defensive (fresh reads
    list fresh), it only matters if a cached plan over this path exists
    in the session."""
    spark.catalog.refreshByPath(out_dir)
    df = spark.read.text(out_dir)
    if "_shard" not in df.columns:
        # zero shard directories (an empty export, or a copy that lost
        # every shard): partition discovery finds no _shard column —
        # report no shards instead of crashing, so verify_export can
        # name every missing one (review r8 pass-7 #1)
        return {}
    rows = (
        df.groupBy("_shard")
        .agg(
            F.count("*").alias("rows"),
            F.expr("bit_xor(xxhash64(value))").alias("xxh_xor"),
        )
        .collect()
    )
    return {
        int(r["_shard"]): {"rows": int(r["rows"]), "xxh_xor": int(r["xxh_xor"])}
        for r in rows
    }


def write_export_manifest(spark: SparkSession, out_dir: str) -> dict:
    """Make an export SELF-CERTIFYING: record per-shard row counts and
    content digests next to the data (the artifact a training loader
    checks before a run — a truncated shard, a lost file, or a partial
    copy fails loudly at load time instead of silently training on a
    damaged corpus). Written via tmp + atomic rename; byte-deterministic
    because the export itself is."""
    per_shard = _shard_digests(spark, out_dir)
    manifest = {
        "format": "jsonl/_shard=<k>",
        "n_rows": sum(s["rows"] for s in per_shard.values()),
        "n_shards": len(per_shard),
        # sort_keys=True below orders the serialized keys; no pre-sort
        "per_shard": {str(k): v for k, v in per_shard.items()},
    }
    p = os.path.join(out_dir, EXPORT_MANIFEST)
    with open(p + ".tmp", "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(p + ".tmp", p)
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> list[str]:
    """Recompute the shard digests and compare against the manifest.
    Returns the list of discrepancies (empty = verified) — per-shard,
    so a damaged copy names exactly which files to re-fetch rather
    than failing the whole hand-off opaquely."""
    with open(os.path.join(out_dir, EXPORT_MANIFEST)) as f:
        manifest = json.load(f)
    actual = {str(k): v for k, v in _shard_digests(spark, out_dir).items()}
    problems = []
    for k in sorted(set(manifest["per_shard"]) | set(actual), key=int):
        want, got = manifest["per_shard"].get(k), actual.get(k)
        if want != got:
            problems.append(f"_shard={k}: manifest {want} != actual {got}")
    return problems


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

    The returned count comes from the export MANIFEST, which is itself
    recomputed from the written artifact (per-shard row counts +
    content digests, one narrow pass) — the number certifies the
    EXPORT, not the plan, and the manifest ships with the shards so the
    loader side re-certifies with :func:`verify_export` before
    training."""
    from venus_spark.plans.registry import all_plans
    from venus_spark.prepared import _anti_tombstones

    curated = _anti_tombstones(
        spark, sf_dir, all_plans()["curated_corpus"].fn(spark, sf_dir)
    )
    export_jsonl(curated, out_dir, shards)
    return write_export_manifest(spark, out_dir)["n_rows"]
