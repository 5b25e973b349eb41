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
    through one site. Case-insensitive (both SQL dialects accept
    'round('; review r11 pass-7 #4); comments are exempt.
    ``dround(`` / ``dround_sql(`` survive the lookbehind by design."""
    import glob
    import os
    import re

    import io
    import tokenize

    root = os.path.join(os.path.dirname(__file__), "..", "venus_spark")
    rx = re.compile(r"(?<![A-Za-z_.])ROUND\(", re.IGNORECASE)
    offenders = []
    for fn in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(fn).read()
        prev_type = None
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.STRING:
                # docstrings (prose) are exempt: they begin a statement,
                # so the previous significant token is structural. SQL
                # strings are always assigned or passed as arguments.
                if prev_type in (
                    tokenize.NEWLINE,
                    tokenize.INDENT,
                    tokenize.DEDENT,
                    tokenize.NL,
                    None,
                ):
                    prev_type = tok.type
                    continue
                if rx.search(tok.string):
                    offenders.append(
                        f"{fn}:{tok.start[0]}: {tok.string[:90]!r}"
                    )
            if tok.type not in (tokenize.NL, tokenize.COMMENT):
                prev_type = tok.type
        # code side: only F.round reaches an engine (Python's builtin
        # round() is driver-side bookkeeping, never part of a plan)
        for ln, line in enumerate(src.splitlines(), 1):
            if re.search(r"F\.round\(", line.split("#", 1)[0]):
                offenders.append(f"{fn}:{ln}: {line.strip()}")
    assert not offenders, offenders


def _find_close(s, i):
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parens")


def test_inline_dround_copies_match_current_template():
    """Lint (review r11 pass-7 #2; retired as a copy-police by ADVICE
    r12 #4): all ~104 oracle SQL strings that inlined the dround
    template textually now COMPOSE from dround_sql() (verified
    byte-identical oracle output for every plan), so template drift is
    impossible at those sites by construction and zero literal copies
    remain outside sqlgen.py itself. The lint stays as a FUTURE-drift
    screen: any hand-inlined copy someone adds later is re-derived
    from dround_sql and flagged if stale, and the rounding idiom
    marker ('+ 5e-1') may only appear inside validated template spans
    — a hand-written unguarded floor form cannot slip in beside the
    guarded ones."""
    import glob
    import os
    import re

    from venus_spark.functions.sqlgen import dround_sql

    root = os.path.join(os.path.dirname(__file__), "..", "venus_spark")
    bad = []
    for fn in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        if fn.endswith(os.path.join("functions", "sqlgen.py")):
            continue  # the template definition itself
        src = open(fn).read()
        spans = []
        pos = 0
        while True:
            i = src.find("(CASE WHEN ABS((", pos)
            if i < 0:
                break
            xo = i + len("(CASE WHEN ABS(")
            xc = _find_close(src, xo)
            x = src[xo + 1 : xc]
            m = re.match(r" \* 1e(\d+)\)", src[xc + 1 :])
            if not m:
                bad.append(f"{fn}: malformed template head at {i}")
                pos = i + 1
                continue
            scale = int(m.group(1))
            want = dround_sql(x, scale)
            got = src[i : i + len(want)]
            if got != want:
                bad.append(
                    f"{fn}: stale/divergent inline dround copy at char "
                    f"{i}: {got[:120]!r} != {want[:120]!r}"
                )
            spans.append((i, i + len(want)))
            pos = i + 1
        for m in re.finditer(re.escape("+ 5e-1"), src):
            if not any(a <= m.start() < b for a, b in spans):
                bad.append(
                    f"{fn}: rounding idiom outside a validated dround "
                    f"template at char {m.start()}"
                )
    assert not bad, bad


def test_dround_extreme_inputs_match_cross_engine(spark):
    """Review r11 pass-7 #1/#3: NaN and ±inf pass through on BOTH
    engines (they fail the ABS guard identically), and magnitudes past
    the 2^63/10^scale clamp region are served unrounded instead of
    Spark silently clamping to ±9223372036854.775807/1e6."""
    vals = [
        float("nan"), float("inf"), float("-inf"),
        1e19, -1e19, 9.3e12, -9.3e12, 2.0**62, 123.4567894,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_s = [r["r"] for r in df.select(dround("x").alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, v) for i, v in enumerate(vals)],
    )
    got_d = [
        r[0]
        for r in con.execute(
            f"SELECT {dround_sql('x')} FROM t ORDER BY i"
        ).fetchall()
    ]
    import math

    for v, s, d in zip(vals, got_s, got_d):
        if math.isnan(v):
            assert math.isnan(s) and math.isnan(d), (v, s, d)
        else:
            assert s == d, (v, s, d)
    # huge magnitudes: identity, not a clamp
    assert got_s[3] == 1e19 and got_s[4] == -1e19
    assert got_s[7] == 2.0**62


def test_percentile_interpolation_bit_parity(spark):
    """Spark ``percentile`` and DuckDB ``QUANTILE_CONT`` currently
    compute bit-identical interpolated values (probed r11: 1200/1200
    over random doubles and exact-rational sets — the same formula
    tree). Several plans rely on this (value_percentiles, the
    duration-percentile tiles, rfm_segments quartiles) with only a
    dround after it, and dround can only neutralize ulp gaps away from
    .5e-6 boundaries — so if an engine upgrade ever changes either
    implementation, this test fails in pytest instead of surfacing as
    an unexplained mirror hash mismatch."""
    import random
    import struct

    random.seed(20260816)
    cases = []
    for _ in range(60):
        n = random.randint(2, 9)
        cases.append([random.uniform(-1e3, 1e3) for _ in range(n)])
    for _ in range(40):
        n = random.randint(2, 9)
        cases.append(
            [
                random.randint(-(10**6), 10**6)
                / random.choice([1, 2, 4, 8, 16, 128])
                for _ in range(n)
            ]
        )
    qs = [0.25, 0.5, 0.75, 0.9]
    rows = [(i, float(v)) for i, vals in enumerate(cases) for v in vals]
    df = spark.createDataFrame(rows, "g int, x double")
    sres = {
        r["g"]: r["p"]
        for r in df.groupBy("g")
        .agg(
            F.percentile(
                "x", F.array(*[F.lit(q) for q in qs])
            ).alias("p")
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    dres = {
        g: p
        for g, p in con.execute(
            f"SELECT g, QUANTILE_CONT(x, {qs}) FROM t GROUP BY g"
        ).fetchall()
    }
    diverged = [
        (g, q, s, d)
        for g in sres
        for q, s, d in zip(qs, sres[g], dres[g])
        if struct.pack("d", s) != struct.pack("d", d)
    ]
    assert not diverged, diverged[:5]


def test_davg_hypothesis_cross_engine_battery(spark):
    """Hypothesis-driven breadth behind the constructed boundary cases:
    random 6-dp-quantized value sets (the exact davg input class — all
    dsum inputs are quantized or exact by the parity discipline) with
    adversarial counts, every case compared Spark-vs-DuckDB in ONE
    batched job per engine. Deliberately includes counts with large
    power-of-two factors (2, 4, 8, 64, 128 divisors put means on .5e-7
    odd multiples) — the population where built-in ROUND diverged."""
    import random

    random.seed(0xC0FFEE)
    cases = []
    for _ in range(150):
        n = random.choice([2, 3, 4, 5, 6, 7, 8, 16, 32, 64, 96, 128])
        vals = [
            random.randint(-(10**10), 10**10) / 10**6 for _ in range(n)
        ]
        cases.append(vals)
    rows = [(g, float(v)) for g, vals in enumerate(cases) for v in vals]
    df = spark.createDataFrame(rows, "g int, x double")
    sres = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(davg("x").alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    dres = {
        g: m
        for g, m in con.execute(
            f"SELECT g, {davg_sql('x')} FROM t GROUP BY g"
        ).fetchall()
    }
    diverged = [
        (g, sres[g], dres[g], cases[g][:4])
        for g in sres
        if sres[g] != dres[g]
    ]
    assert not diverged, diverged[:5]
