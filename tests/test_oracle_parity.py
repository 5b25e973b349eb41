"""Every registered plan must match its DuckDB oracle at sf0.001 —
the in-repo mirror of the driver's correctness gate (see
venus_spark/oracle.py). Plans without an oracle get a rows-only check.
"""

from __future__ import annotations

import pytest

from venus_spark.oracle import duckdb_connect, compare
from venus_spark.plans import all_plans

PLANS = all_plans()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(PLANS))
def test_plan_matches_oracle(name, spark, sf_dir, con):
    p = PLANS[name]
    df = p.fn(spark, sf_dir)
    if p.oracle is None:
        assert df.count() >= 0
        return
    res = compare(name, df, con, p.oracle)
    assert res.ok, res.detail


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
