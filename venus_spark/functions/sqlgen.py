"""SQL fragment builders for the DuckDB oracle — kept adjacent to the
Spark helpers in :mod:`venus_spark.functions` so every parity-sensitive
expression has exactly one Spark form and one SQL form, defined together.
"""

from __future__ import annotations

from venus_spark.functions import DECIMAL_ACC, HASH_P31, WHITESPACE_CLASS


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {DECIMAL_ACC.upper()})) AS DOUBLE)"


def dround_sql(expr: str, scale: int = 6) -> str:
    """SQL twin of :func:`venus_spark.functions.dround` — the
    deterministic FLOOR-based rounding. Raw ROUND must never reach a
    parity-hashed column (see dround's docstring for the boundary
    divergence the r11 sf0.1 rotation caught)."""
    # E-notation literals: both engines parse 1e6/5e-1 as DOUBLE,
    # whereas 1000000.0/0.5 parse as DECIMAL (Spark SQL and DuckDB
    # alike) — and FLOOR(bigint)/DECIMAL would type the Spark output
    # column DECIMAL instead of the canonical DOUBLE. The ABS guard
    # mirrors dround's (see its docstring): Spark FLOOR clamps at
    # ±2^63 where DuckDB does not, so near-2^63 scaled products (and
    # NaN/inf, which fail the comparison identically on both engines)
    # pass through unrounded. This exact template is what the
    # tests/test_round_parity.py lint validates every inline copy in
    # plan oracle strings against — change it here and the lint flags
    # every stale copy.
    m = f"1e{scale}"
    return (
        f"(CASE WHEN ABS(({expr}) * {m}) < 9e18 "
        f"THEN (FLOOR(({expr}) * {m} + 5e-1) / {m}) ELSE ({expr}) END)"
    )


def davg_sql(expr: str) -> str:
    return dround_sql(f"{dsum_sql(expr)} / COUNT({expr})")


def fmt_ts_sql(expr: str, micros: bool = True) -> str:
    pattern = "%Y-%m-%d %H:%M:%S.%f" if micros else "%Y-%m-%d %H:%M:%S"
    return f"STRFTIME({expr}, '{pattern}')"


def tokens_sql(expr: str) -> str:
    # WHITESPACE_CLASS, not \s: RE2's \s lacks \x0B while Java's has it
    # (see functions/__init__.py).
    return (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY({expr}, "
        f"'{WHITESPACE_CLASS}+'), t -> t <> '')"
    )


def shingles_sql(expr: str, n: int = 3) -> str:
    # Empty-token docs get an EMPTY shingle list (the whole-text branch
    # would render Spark [''] vs DuckDB [NULL] — see functions.shingles).
    t = tokens_sql(expr)
    return (
        f"(CASE WHEN LEN({t}) >= {n} THEN "
        f"LIST_DISTINCT([ARRAY_TO_STRING(({t})[i:i+{n - 1}], ' ') "
        f"FOR i IN RANGE(1, LEN({t}) - {n - 2})]) "
        f"WHEN LEN({t}) > 0 THEN [ARRAY_TO_STRING({t}, ' ')] "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def char_trigrams_sql(expr: str) -> str:
    """DuckDB twin of :func:`venus_spark.operators.text.char_trigrams`:
    distinct lowercase character 3-grams, empty list under 3 chars.
    Element ORDER may differ between the engines (array_distinct keeps
    first occurrence, LIST_DISTINCT does not promise one) — use only
    under set semantics (membership, intersection counts)."""
    low = f"LOWER({expr})"
    return (
        f"(CASE WHEN LENGTH({low}) >= 3 THEN "
        f"LIST_DISTINCT([SUBSTR({low}, i, 3) "
        f"FOR i IN RANGE(1, LENGTH({low}) - 1)]) "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def bigram_pairs_sql(expr: str) -> str:
    # RANGE(1, n) is empty when n <= 1, so 0/1-token input yields [].
    t = tokens_sql(expr)
    return f"[({t})[i] || ' ' || ({t})[i+1] FOR i IN RANGE(1, LEN({t}))]"


def token_hash31_sql(expr: str) -> str:
    return (
        f"(CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT) % {HASH_P31})"
    )


def double_lit_sql(x: float) -> str:
    """A double literal DuckDB parses to EXACTLY the same double Python
    holds. A bare ``1.1544435024261475`` parses as DECIMAL(17,16) and
    DuckDB's decimal->double conversion is not correctly rounded (can be
    1 ulp off the strtod value); routing through a string cast uses the
    correctly-rounded strtod path. Use this for any float inlined into
    oracle SQL that feeds a value-hashed column."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def double_array_sql(xs) -> str:
    """Literal array<double> with exact per-element parity (see
    :func:`double_lit_sql`)."""
    return "[" + ", ".join(double_lit_sql(x) for x in xs) + "]"


def dot_sql(a: str, b: str) -> str:
    # list_reduce folds left like Spark's F.aggregate
    return (
        f"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
        f"LIST_ZIP({a}, {b}).apply(p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def l2sq_sql(a: str, b: str) -> str:
    # Same left fold as dot_sql; (x - y) * (x - y) mirrors functions.l2sq.
    return (
        f"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
        f"LIST_ZIP({a}, {b}).apply(p -> "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        f"(acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (SQRT({dot_sql(a, a)}) * SQRT({dot_sql(b, b)})))"


def ewma_fold_sql(arr: str, alpha: float) -> str:
    """DuckDB twin of :func:`venus_spark.functions.ewma_fold` —
    LIST_REDUCE without an initial value seeds with element 1, matching
    the Spark fold's NULL-seed-first-element-wins semantics."""
    return (
        f"LIST_REDUCE({arr}, (acc, x) -> "
        f"{double_lit_sql(alpha)} * x + {double_lit_sql(1 - alpha)} * acc)"
    )


def hashed_shingles_sql(expr: str = "text") -> str:
    """Distinct hash31-hashed word-3-gram shingle set — the ONE SQL twin
    of the prepared index's ``_sh_h`` column (prepared._minhash_rows),
    shared by every oracle that compares against stored shingle sets."""
    return (
        f"LIST_DISTINCT([{token_hash31_sql('s')} "
        f"FOR s IN {shingles_sql(expr)}])"
    )
