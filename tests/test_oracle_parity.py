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


def test_no_bare_one_point_zero_in_hash_checked_math():
    """PARITY.md bans exact-numeric literals in double math; the class
    REALIZED twice (rfm_segments' half-boundary split in r5;
    retrieval_eval_mrr's reciprocal rank in r6): a bare ``1.0`` parses
    as DECIMAL on both engines and their decimal division scale rules
    differ at 6-dp rounding boundaries — each surviving site is a
    latent coin flip at a new scale factor. VERDICT r6 #2 swept the
    residue; this lint keeps it swept:

    - no registered plan's oracle SQL may contain an unquoted ``1.0``
      token (quoted forms are double_lit_sql's exact strtod path);
    - no source file under venus_spark/ may build a Spark literal with
      ``lit(1.0)`` (write ``F.lit(1).cast("double")`` so grep and
      reviewer alike see the double intent).
    """
    import os
    import re

    from venus_spark.plans import all_plans

    offenders = {}
    for name, p in sorted(all_plans().items()):
        sql = p.oracle or ""
        stripped = re.sub(r"'[^']*'", "''", sql)
        if re.search(r"(?<![\d.\w])1\.0(?![\d])", stripped):
            offenders[name] = "bare 1.0 in oracle SQL"
    assert not offenders, offenders

    pkg = os.path.join(os.path.dirname(__file__), "..", "venus_spark")
    src_hits = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if "lit(1.0)" in line:
                        src_hits.append(f"{path}:{i}")
    assert not src_hits, src_hits
