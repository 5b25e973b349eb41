"""Cross-engine rounding parity (review r11 pass-6 — the lm_quality
sf0.1 finding).

Built-in ROUND(x, 6) is NOT cross-engine deterministic: Spark
classifies the .5 boundary on the exact decimal expansion of the
double (BigDecimal HALF_UP) while DuckDB classifies it on the
already-rounded ``x * 10^6`` double product. Exact-rational inputs —
a 6-dp decimal sum divided by a row count, integer ratios, percent
ranks — land EXACTLY on those boundaries routinely, so the divergence
is a matter of corpus size, not luck: the sf0.01 full mirror never
populated a boundary in 10 rounds, the first sf0.1 rotation slice did
(lm_quality doc 1705: mean -3.4140895 rounded apart).

The fix is :func:`venus_spark.functions.dround` /
:func:`venus_spark.functions.sqlgen.dround_sql`: FLOOR(x*10^s + 0.5)
/ 10^s — three IEEE ops both engines implement identically, so equal
input doubles give equal outputs BY CONSTRUCTION. These tests pin:

- the historical failure case (boundary mean from lm_quality),
- a battery of exact .5e-6 boundary rationals, positive and negative,
- agreement between dround (Spark) and dround_sql (DuckDB) on the
  same doubles, including values near representability limits.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from venus_spark.functions import davg, dround
from venus_spark.functions.sqlgen import davg_sql, dround_sql


def _spark_davg(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    return df.agg(davg("x").alias("m")).first()["m"]


def _duck_davg(vals):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    return con.execute(f"SELECT {davg_sql('x')} FROM t").fetchone()[0]


def test_davg_boundary_mean_matches_cross_engine(spark):
    """The exact lm_quality failure shape: a 6-dp decimal sum over a
    count that puts the mean on an odd multiple of 5e-7."""
    cases = [
        [-3.414089, -3.414090],          # mean -3.4140895 (the finding)
        [0.000001, 0.0],                 # mean 0.0000005
        [-0.000001, 0.0],                # mean -0.0000005
        [1.000001, 1.000002],            # mean 1.0000015
        [7.5e-06, 2.5e-06, 0.0, 0.0],    # mean 0.0000025
        [123456.000003, 123456.000004],  # big + boundary
    ]
    for vals in cases:
        s = _spark_davg(spark, vals)
        d = _duck_davg(vals)
        assert s == d, (vals, s, d)


def test_dround_matches_dround_sql_on_boundary_battery(spark):
    """dround (Spark) == dround_sql (DuckDB) on exact boundary
    rationals, ulp-neighbors, and ordinary values."""
    import math

    vals = []
    for k in (-7, -3, -1, 0, 1, 3, 9, 1999999, -1999999):
        b = k * 5e-7  # boundary multiples
        vals += [b, math.nextafter(b, 1), math.nextafter(b, -1)]
    vals += [0.125, -0.0078125, 3.14159265358979, -2.718281828459045,
             1e-7, -1e-7, 4999.9999995, -4999.9999995]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got_s = [
        r["r"]
        for r in df.select(dround("x").alias("r")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, float(v)) for i, v in enumerate(vals)],
    )
    got_d = [
        r[0]
        for r in con.execute(
            f"SELECT {dround_sql('x')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_s == got_d, list(
        (v, s, d) for v, s, d in zip(vals, got_s, got_d) if s != d
    )


def test_dround_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(dround("x").alias("r")).first()["r"] is None


@pytest.mark.parametrize("scale,mult", [(4, 1e4), (6, 1e6), (9, 1e9)])
def test_dround_scales(spark, scale, mult):
    import math

    from venus_spark.functions.sqlgen import double_lit_sql

    b = 3 / (2 * mult)  # odd multiple of half-ulp at this scale
    df = spark.createDataFrame([(b,)], "x double")
    s = df.select(dround("x", scale).alias("r")).first()["r"]
    # double_lit_sql, NOT a bare literal: DuckDB parses a bare decimal
    # literal as DECIMAL and its decimal->double conversion is not
    # correctly rounded — the exact hazard the helper documents (a bare
    # repr() here reproducibly flips this boundary case at scale 4).
    d = duckdb.sql(
        f"SELECT {dround_sql(double_lit_sql(b), scale)}"
    ).fetchone()[0]
    assert s == d


def test_no_raw_round_in_parity_source():
    """Lint: built-in ROUND / F.round must not reappear anywhere in
    venus_spark — the entire class of boundary divergences re-enters
    through one site. Comments are exempt."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "venus_spark")
    offenders = []
    for fn in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        for ln, line in enumerate(open(fn), 1):
            code = line.split("#", 1)[0]
            if re.search(r"F\.round\(", code) or re.search(
                r"(?<![A-Za-z_.])ROUND\(", code
            ):
                offenders.append(f"{fn}:{ln}: {line.strip()}")
    assert not offenders, offenders
