"""Plan registry powering ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each plan is a pure function (spark, sf_dir) -> DataFrame plus an optional
ANSI-SQL oracle string the driver runs via DuckDB against the same parquet
tables. Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from venus_spark.retry import RetryingDataFrame

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Plan"] = {}

# Modules that register plans on import.
_PLAN_MODULES = (
    "venus_spark.plans.venus_surface",
    "venus_spark.plans.variant_surface",
    "venus_spark.plans.ingest_surface",
    "venus_spark.plans.tpch",
    "venus_spark.plans.tpch2",
    "venus_spark.plans.tpch3",
    "venus_spark.plans.pipeline_quality",
    "venus_spark.plans.pipeline_curation",
    "venus_spark.plans.pipeline_tokens",
    "venus_spark.plans.pipeline_decontam",
    "venus_spark.plans.pipeline_dedup",
    "venus_spark.plans.pipeline_ann",
    "venus_spark.plans.pipeline_ann_exact",
    "venus_spark.plans.pipeline_multimodal",
    "venus_spark.plans.pipeline_retrieval",
    "venus_spark.plans.pipeline_behavioral",
    "venus_spark.plans.pipeline_ann_pq",
    "venus_spark.plans.pipeline_dedup_scale",
    "venus_spark.plans.pipeline_eval",
    "venus_spark.plans.analytics_ext",
    "venus_spark.plans.analytics_ext2",
    "venus_spark.plans.analytics_ext3",
    "venus_spark.plans.analytics_ext4",
    "venus_spark.plans.analytics_ext5",
    "venus_spark.plans.streaming_surface",
)


@dataclass(frozen=True)
class Plan:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = field(default="", compare=False)


def plan(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate plan name {name!r}")

        # Engine-internal retry-on-conflict (venus_spark/retry.py):
        # a driver-side action on ANY registered plan's result that
        # races a concurrent index merge/vacuum swap (missing-file
        # conflict) re-invokes the plan function — which re-runs the
        # freshness guards and re-plans against refreshed listings —
        # and retries the action once. Plans without live/prepared
        # reads never hit the conflict class, so the wrapper is inert
        # for them beyond a constant-cost re-wrap of the result.
        @functools.wraps(fn)
        def armed(spark: SparkSession, sf_dir: str) -> DataFrame:
            return RetryingDataFrame(
                fn(spark, sf_dir), lambda: fn(spark, sf_dir)
            )

        _REGISTRY[name] = Plan(
            name=name, fn=armed, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_plans() -> dict[str, Plan]:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
