"""Column-expression helpers shared by plans and operators.

Everything here is a built-in pyspark.sql.functions composition —
JVM-side, whole-stage-codegen friendly. No Python UDFs.

Parity discipline (driver correctness gate hashes values against a
DuckDB oracle): float aggregation order differs between engines, so
sums go through an exact DECIMAL accumulator and come back as DOUBLE —
bit-identical on both sides. The matching SQL fragments live in
:mod:`venus_spark.functions.sqlgen`.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-sum accumulator type. 25-6 = 19 integral digits: enough headroom
# for 100 TB-scale sums of money-like doubles without overflow.
DECIMAL_ACC = "decimal(25,6)"

# 2^31 - 1 (Mersenne prime) — modulus for 31-bit token hashing so that
# minhash permutation arithmetic (a*h + b) stays far below 2^63 and is
# safe under ANSI overflow checking in Spark and DuckDB alike.
HASH_P31 = 2147483647


def dsum(col: Column | str) -> Column:
    """Order-independent exact SUM of a double expression (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_ACC)).cast("double")


def dround(col: Column | str, scale: int = 6) -> Column:
    """Cross-engine-DETERMINISTIC fixed-point rounding:
    ``FLOOR(x * 10^scale + 0.5) / 10^scale`` — three IEEE double ops
    both engines implement identically, so identical input doubles
    yield identical output doubles BY CONSTRUCTION (half-toward-+inf
    at exact boundaries).

    Built-in ROUND must never appear in a parity-hashed column: Spark
    classifies the .5 boundary on the exact decimal expansion of the
    double (BigDecimal HALF_UP) while DuckDB classifies it on the
    already-rounded ``x*10^scale`` product — and exact-rational inputs
    (a 6-dp decimal sum / count, integer ratios, percent ranks) land
    EXACTLY on those boundaries routinely. Found at sf0.1 by the r11
    rotation mirror: lm_quality's davg mean hit -3.4140895 and the
    engines rounded it apart; the sf0.01 full mirror had never
    populated a boundary. Domain: |x| < 2^63 / 10^scale (Spark FLOOR
    yields BIGINT under ANSI overflow checking) — every rounded score,
    ratio, or mean in the registry is orders of magnitude inside."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.lit(float(10**scale))
    # Magnitude guard (review r11 pass-7 #1/#3): Spark's FLOOR(double)
    # yields BIGINT and silently CLAMPS past ±2^63 while DuckDB's stays
    # double — a whole-corpus dsum fed through dround would diverge at
    # a large-enough sf (and NaN/±inf mapped to 0/±clamp on Spark only).
    # Inputs whose scaled product nears 2^63 pass through unrounded:
    # beyond ~9e18/10^scale the double grid is coarser than the rounding
    # step anyway, and NaN/inf fail the comparison on both engines
    # identically, restoring NaN->NaN / inf->inf passthrough.
    return F.when(
        F.abs(c * m) < F.lit(9e18), F.floor(c * m + F.lit(0.5)) / m
    ).otherwise(c)


def davg(col: Column | str) -> Column:
    """AVG via exact sum / count, rounded to 6 dp (both engines compute the
    same double division on identical inputs; :func:`dround` keeps the
    boundary classification identical too)."""
    c = F.col(col) if isinstance(col, str) else col
    return dround(dsum(c) / F.count(c))


def fmt_ts(col: Column | str, micros: bool = True) -> Column:
    """Render a timestamp as a canonical string (oracle-safe output type)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = "yyyy-MM-dd HH:mm:ss.SSSSSS" if micros else "yyyy-MM-dd HH:mm:ss"
    return F.date_format(c, pattern)


# Explicit ASCII whitespace class instead of \s: Java regex \s includes
# \x0B (vertical tab), RE2 (DuckDB) \s does not — on text containing a
# vertical tab the two engines would tokenize differently. The explicit
# class is Java's exact \s set, spelled so both engines agree. (Same
# discipline as the BPE tokenizer's explicit class, pipeline_quality.py.)
WHITESPACE_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> without empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WHITESPACE_CLASS + "+"), lambda x: x != F.lit(""))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (Broder shingling) — the similarity
    unit for MinHash/SimHash near-dup. Word n-grams are discriminative
    where unigram token sets are not: two documents sharing vocabulary
    but not phrasing have near-zero shingle overlap. Documents shorter
    than ``n`` tokens contribute one whole-text shingle; a document with
    NO tokens contributes none (an empty array — the whole-text branch
    would render it as Spark ``['']`` vs DuckDB ``[NULL]``, the one
    place the engines disagree, caught by tests/test_text_parity_fuzz).

    Built by zipping n position-shifted slices of the token array
    (n-1 zip_with passes, O(tokens) total) rather than slicing a
    3-token window per output position inside a transform lambda —
    the higher-order functions are interpreted per element, and the
    zip form is ~5x faster at sf0.1 with identical output."""
    return shingles_of_tokens(tokens(col), n)


def shingles_of_tokens(t: Column, n: int = 3) -> Column:
    """:func:`shingles` over an ALREADY-TOKENIZED array column — the
    same expression tree with ``t`` in place of ``tokens(col)``.

    Exists so a caller that has materialized the token array once (the
    curation funnel tokenizes the corpus behind a lineage barrier, r16)
    can build shingles without re-inlining the tokenizer: this
    expression references ``t`` ~13 times, which is 13 array-column
    reads on a stored array but 13 FULL ``split()`` evaluations per row
    when ``t`` is the raw tokenize expression (CollapseProject re-
    inlines it into every reference — the sim_cosine_pairs lesson)."""
    cnt = F.size(t) - (n - 1)
    grams = F.slice(t, 1, cnt)
    for k in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(t, k, cnt), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams)
        .when(F.size(t) > 0, F.array(F.concat_ws(" ", t)))
        .otherwise(F.array().cast("array<string>"))
    )


def bigram_pairs(col: Column | str) -> Column:
    """Non-distinct adjacent token bigrams, in position order — the
    pair-frequency unit for BPE-merge statistics (multiplicity matters,
    unlike the distinct Broder shingles). Empty for 0/1-token input:
    greatest(…, 0) because slice() rejects negative lengths."""
    t = tokens(col)
    n_pairs = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, n_pairs),
        F.slice(t, 2, n_pairs),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )


def token_hash31(col: Column | str) -> Column:
    """Deterministic 31-bit hash of a string, identical in DuckDB.

    md5 hex -> first 15 hex digits -> bigint -> mod (2^31-1). Stays in
    built-in expressions (md5/conv/cast) so it runs in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    h60 = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return h60 % F.lit(HASH_P31)


def lit_doubles(values: Iterable[float]) -> Column:
    """array<double> literal built in ONE py4j round-trip.

    ``F.array(*[F.lit(x) for x in xs])`` costs 2-3 driver<->JVM calls
    PER ELEMENT — for a dim-64 query vector or a 16x64 RP weight matrix
    that is hundreds to thousands of synchronous socket round-trips per
    plan build (profiled at 0.1-1.0 s of pure py4j chatter; guide §5:
    the driver should do almost no data work, and this was pure driver
    overhead). One ``F.expr`` string with D-suffixed double literals
    parses JVM-side into the IDENTICAL CreateArray(Literal...) tree:
    Python ``repr`` emits the shortest string that round-trips to the
    same IEEE double, and Java ``Double.parseDouble`` reads it back to
    that exact double, so values are bit-identical to the per-element
    form. Non-finite values fall back to the per-element path (no SQL
    literal form for NaN/inf)."""
    vals = [float(v) for v in values]
    if not vals:
        # F.array() with zero children types as array<void>; the cast
        # keeps an empty literal composable into zip_with/aggregate
        # kernels (ADVICE r15).
        return F.expr("array()").cast("array<double>")
    if not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v).cast("double") for v in vals])
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via a left fold —
    same accumulation order as the oracle's explicit fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance of two array<double> columns via the same
    left fold as :func:`dot` — the PQ encode/ADC kernel. Squaring is
    ``d * d`` (one multiply), mirrored exactly in the oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns.

    try_divide, not `/`: an all-zero vector has norm 0 and the result
    must be NULL — DuckDB's double division already yields NULL on a
    zero divisor, and ANSI `/` would raise DIVIDE_BY_ZERO instead.
    The nonzero path is the same double division bit-for-bit.
    """
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def ewma_fold(arr: Column, alpha: float) -> Column:
    """EWMA left fold over an ordered array<double>: seeds with the
    first element, then ewma = α·x + (1-α)·ewma per step — the ONE
    kernel behind ewma_smoothing, its oracle (`sqlgen.ewma_fold_sql`,
    whose LIST_REDUCE seeds with element 1, the same semantics), and
    the generative bit-equality test. IEEE-double step order is
    identical across all three."""
    step = lambda acc, x: F.when(acc.isNull(), x).otherwise(  # noqa: E731
        F.lit(alpha) * x + F.lit(1 - alpha) * acc
    )
    return F.aggregate(arr, F.lit(None).cast("double"), step)
