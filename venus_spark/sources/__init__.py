"""Sources: batch parquet table loaders + streaming source adapters.

The reference's tables live in PostgreSQL (migration
alembic/versions/37716151a213_initialise_database.py in /root/reference);
here every table is a parquet-backed DataFrame.  The driver's synthetic
star schema (TESTDATA.md) provides: region nation customer supplier part
orders lineitem events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Columnar scan: Catalyst prunes columns and
    pushes filters into the parquet reader automatically."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can be written in SQL."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
