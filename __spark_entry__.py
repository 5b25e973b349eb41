"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered plan from
:mod:`venus_spark.plans` (one per implemented operator from SURVEY.md §2
plus the training-data pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from venus_spark.plans import all_plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return all_plans()["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2 + extensions)."""
    return {name: p.fn for name, p in all_plans().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible plan."""
    return {name: p.oracle for name, p in all_plans().items() if p.oracle is not None}


def mirror(
    spark: SparkSession,
    sf_dir: str = "/root/testdata/sf0.01",
    names: list[str] | None = None,
) -> dict[str, dict]:
    """FULL-registry correctness check in one call (VERDICT r14 #3).

    Runs EVERY registered plan side-by-side with its DuckDB oracle at
    ``sf_dir`` — the identical sorted-columns / exact-value compare the
    driver's CORRECTNESS gate applies to its 50-key sample — and
    returns ``{plan_name: {rows_match, schema_match, hash_match,
    spark_rows, oracle_rows, err}}`` for all plans (121 of 191 have
    never been inside the driver's frozen sample; this covers them
    all). Equivalent CLI: ``python scripts/run_mirror.py OUT.json
    [--sf DIR]``. ~3-4 min at sf0.01 on local[32]."""
    from venus_spark.oracle import run_mirror

    return run_mirror(spark, sf_dir, names=names)
