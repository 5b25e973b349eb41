"""Local mini-driver: run a plan on Spark AND its DuckDB oracle, compare.

Mirrors the external correctness gate (row count + column names +
order-insensitive values) so parity regressions are caught in-repo before
a round's verify. Designed for bit-equality: sums go through decimal
accumulators, timestamps are rendered to strings (see
venus_spark.functions docstring).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from venus_spark.sources import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):  # partial dirs (edge-case test fixtures)
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'" if os.path.isdir(path) else f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and (
            b is None or (isinstance(b, float) and math.isnan(b))
        )
    if isinstance(a, float) or isinstance(b, float):
        # exact equality — parity is bit-level by design, no tolerance
        return float(a) == float(b)
    return a == b


def _dtype_mismatches(sp_raw: pd.DataFrame, du_raw: pd.DataFrame) -> list[str]:
    """Column-level dtype comparison on the raw pandas frames, BEFORE the
    astype(object) erasure below.  The external gate's value-hash is
    type-sensitive (DuckDB SUM(int) -> HUGEINT -> float64 in pandas vs
    Spark BIGINT -> int64 hash-fails on equal values); this catch-up check
    makes that regression class visible pre-commit (VERDICT r1 #3)."""
    bad = []
    for c in sorted(set(sp_raw.columns) & set(du_raw.columns)):
        da, db = sp_raw[c].dtype, du_raw[c].dtype
        # Integer width differences (int32 year vs BIGINT) hash identically
        # at the gate (r1 evidence: q7/q8/q9 passed with int32 vs int64);
        # what it does NOT tolerate is the int-kind vs float-kind change
        # (DuckDB HUGEINT -> float64 vs Spark BIGINT -> int64).  Only that
        # transition is flagged: DATE (Spark 'O' vs DuckDB 'M') and
        # DECIMAL (Spark 'O' vs DuckDB 'f') columns normalize equal and
        # hash equal at the gate, so a bare kind != comparison would
        # false-fail them (ADVICE r2).
        ka = "i" if da.kind in ("i", "u") else da.kind
        kb = "i" if db.kind in ("i", "u") else db.kind
        if {ka, kb} == {"i", "f"}:
            bad.append(f"{c!r}: spark dtype {da} vs oracle dtype {db}")
    return bad


def compare(
    name: str,
    spark_df,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> CompareResult:
    sp_raw = spark_df.toPandas()
    du_raw = con.sql(oracle_sql).df()
    sp = _normalize(sp_raw.astype(object).where(pd.notnull, None))
    du = _normalize(du_raw.astype(object).where(pd.notnull, None))
    if list(sp.columns) != list(du.columns):
        return CompareResult(name, False, len(sp), len(du), f"columns differ: spark={list(sp.columns)} oracle={list(du.columns)}")
    dt_bad = _dtype_mismatches(sp_raw, du_raw)
    if dt_bad:
        return CompareResult(name, False, len(sp), len(du), "dtypes differ: " + "; ".join(dt_bad))
    if len(sp) != len(du):
        return CompareResult(name, False, len(sp), len(du), "row counts differ")
    for i in range(len(sp)):
        for c in sp.columns:
            a, b = sp.at[i, c], du.at[i, c]
            if not _values_equal(a, b):
                return CompareResult(
                    name, False, len(sp), len(du),
                    f"row {i} col {c!r}: spark={a!r} ({type(a).__name__}) oracle={b!r} ({type(b).__name__})",
                )
    return CompareResult(name, True, len(sp), len(du))


def run_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from venus_spark.plans import all_plans

    con = duckdb_connect(sf_dir)
    results = []
    for pname, p in all_plans().items():
        if names and pname not in names:
            continue
        df = p.fn(spark, sf_dir)
        if p.oracle is None:
            n = df.count()
            results.append(CompareResult(pname, n >= 0, n, -1, "rows-only (no oracle)"))
        else:
            results.append(compare(pname, df, con, p.oracle))
    return results


def correctness_record(r: CompareResult) -> dict:
    """Map a CompareResult onto the driver's CORRECTNESS row shape
    (``rows_match`` / ``schema_match`` / ``hash_match`` / ``err``).

    ``compare`` short-circuits at the first mismatch, so a failed row
    reports the *first* failing layer: column/dtype mismatch -> schema,
    count mismatch -> rows, value mismatch -> hash. Rows-only plans
    (no oracle) record ``hash_match: null`` exactly as the driver's
    weaker check does."""
    rows_only = r.rows_oracle < 0
    schema_ok = not (
        r.detail.startswith("columns differ")
        or r.detail.startswith("dtypes differ")
    )
    return {
        "rows_match": (
            (r.rows_spark >= 0) if rows_only else (r.rows_spark == r.rows_oracle)
        ),
        "schema_match": None if rows_only else schema_ok,
        "hash_match": None if rows_only else r.ok,
        "spark_rows": r.rows_spark,
        "oracle_rows": None if rows_only else r.rows_oracle,
        "err": None if r.ok else r.detail,
    }


def run_mirror(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, dict]:
    """The FULL-registry oracle check in CORRECTNESS format — every
    registered plan (not a sample) run side-by-side with its DuckDB
    oracle at ``sf_dir``, returned as {plan: correctness-row}. This is
    what ``scripts/run_mirror.py`` persists each round and what
    ``__spark_entry__.mirror`` exposes to the driver (VERDICT r14 #3:
    121/191 plans have never been in the driver's frozen 50-key
    CORRECTNESS sample; this makes the full check a one-call affair)."""
    return {
        r.name: correctness_record(r) for r in run_all(spark, sf_dir, names)
    }
