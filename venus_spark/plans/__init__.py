"""Query plans: the reference's documented SQL surface (SURVEY.md §2B),
TPC-H-style analytics, and the training-data pipeline operators, each as
a named (spark, sf_dir) -> DataFrame callable with (where SQL can express
it) a DuckDB oracle string.
"""

from __future__ import annotations

from venus_spark.plans.registry import Plan, all_plans, plan

__all__ = ["Plan", "all_plans", "plan"]
