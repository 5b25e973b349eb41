"""Bucketed join layouts: the 32-bucket sales tables (zero-shuffle
q18) and the bucketed LSH band table."""

from __future__ import annotations

import os
import re
import shutil
import time

from pyspark.sql import SparkSession

from venus_spark.sources import load_table
from venus_spark.prepared import docs as _docs

N_BUCKETS = 32

def bucketed_sales(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """``(lineitem, orders)`` co-bucketed on the order key: both tables
    written ``bucketBy(N_BUCKETS, orderkey).sortBy(orderkey)`` — the
    Spark expression of co-located storage. A join or groupBy on the
    bucket key then needs NO exchange: each task reads bucket i of both
    sides, already hash-distributed and sorted. At 100 TB this is the
    difference between shuffling the fact table per query and never
    shuffling it at all; the bucket count is sized per-SF here, by
    target file size in production.

    Bucket METADATA lives in the session catalog (this container has no
    persistent metastore — production parks the table spec in one), so
    an unknown table is (re)built into ``spark.sql.warehouse.dir``; one
    shuffle each at ingest time, exactly like the other prepared
    artifacts."""
    sfx = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    names = (f"lineitem_bkt_{sfx}", f"orders_bkt_{sfx}")
    for name, table, key in (
        (names[0], "lineitem", "l_orderkey"),
        (names[1], "orders", "o_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            # A fresh process has an empty in-memory catalog while the
            # warehouse directory persists; saveAsTable refuses to adopt
            # an orphaned location, so clear it and rebuild (bucket
            # metadata cannot outlive the catalog entry without a real
            # metastore).
            loc = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), name
            )
            if os.path.exists(loc):
                shutil.rmtree(loc)
            (
                load_table(spark, sf_dir, table)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
    return names

def _lsh_bands_table(sf_dir: str) -> str:
    sfx = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    return f"lsh_bands_bkt_{sfx}"

def _drop_lsh_bands(spark: SparkSession, sf_dir: str) -> None:
    """Invalidate the bucketed band layout after its source (the MinHash
    index) changes — the table is derived and rebuilt lazily on next
    use; serving stale bands would silently drop candidate pairs for
    appended documents."""
    spark.sql(f"DROP TABLE IF EXISTS {_lsh_bands_table(sf_dir)}")

def lsh_bands_bucketed(spark: SparkSession, sf_dir: str) -> str:
    """The LSH band keys as a BUCKETED catalog table
    ``(doc_id, band_idx, band_hash)``, bucketed + sorted on
    ``band_hash``: the candidate self-join on (band_idx, band_hash)
    then rides the buckets — each task reads bucket i of both sides,
    already co-hash-distributed, with ZERO shuffle exchanges. At
    100 TB the band self-join is the dedup run's only corpus-sized
    shuffle, and this layout removes it; build is one explode of the
    stored signatures + one bucketed write at ingest time (same
    catalog-resident pattern and caveats as ``bucketed_sales``)."""
    from venus_spark.operators.dedup import lsh_bands

    name = _lsh_bands_table(sf_dir)
    if not spark.catalog.tableExists(name):
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), name
        )
        if os.path.exists(loc):
            shutil.rmtree(loc)
        (
            lsh_bands(_docs.documents_minhash(spark, sf_dir))
            .write.bucketBy(16, "band_hash")
            .sortBy("band_hash")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    return name
