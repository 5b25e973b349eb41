"""Cross-engine parity fuzz for the text primitives every dedup/quality
plan is built on: tokens, shingles, and the canonical fingerprint must
produce IDENTICAL results in Spark (Java regex) and DuckDB (RE2) even
on adversarial input — vertical tabs (where Java's \\s and RE2's \\s
genuinely differ), CRLF, runs of mixed whitespace, empties, unicode
(NBSP must NOT split in either engine), and regex metacharacters."""

from __future__ import annotations

import duckdb
import pytest

ADVERSARIAL = [
    "plain words here",
    "",
    "   ",
    "a\x0bb",  # vertical tab: Java \s splits, RE2 \s does not — the fixed class must agree
    "a\tb\tc",
    "a\r\nb\rc\nd",
    "  leading and trailing  ",
    "double  space\tand\ttabs",
    "nbsp stays one token",  # NBSP is not ASCII whitespace in either engine
    "unicode héllo wörld 東京 déjà",
    "regex .* meta [chars] (are) |literal| ^tokens$ \\backslash",
    "a b c d e f g h i j k l m n o p",  # enough tokens for many shingles
    "x",
    "\x0b\x0b\x0b",
    "mixed \x0b\t\r\n all whitespace kinds",
    "trailing-vtab\x0b",
]


@pytest.fixture(scope="module")
def frames(spark):
    from pyspark.sql import functions as F

    from venus_spark.functions import shingles, tokens
    from venus_spark.functions.sqlgen import shingles_sql, tokens_sql
    from venus_spark.operators.text import fingerprint_col
    from venus_spark.plans.pipeline_quality import _FINGERPRINT

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )
    sp = (
        df.select(
            "doc_id",
            tokens("text").alias("toks"),
            shingles("text").alias("sh"),
            fingerprint_col("text").alias("fp"),
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.register("documents_py", _pandas(df))
    du = con.sql(
        f"SELECT doc_id, {tokens_sql('text')} AS toks, {shingles_sql('text')} AS sh, "
        f"{_FINGERPRINT} AS fp FROM documents_py ORDER BY doc_id"
    ).fetchall()
    return sp, du


def _pandas(df):
    return df.toPandas()


def test_tokens_agree(frames):
    sp, du = frames
    for s, d in zip(sp, du):
        assert s["toks"] == list(d[1]), f"doc {s['doc_id']}: {s['toks']} != {d[1]}"


def test_shingles_agree(frames):
    # Set comparison: DuckDB's LIST_DISTINCT does not preserve input
    # order (Spark's array_distinct does). Every consumer treats the
    # shingle list as a SET (explode->aggregate, LIST_INTERSECT sizes),
    # so set equality IS the parity contract; nothing may depend on
    # element order.
    sp, du = frames
    for s, d in zip(sp, du):
        assert sorted(s["sh"]) == sorted(d[2]), f"doc {s['doc_id']}: {s['sh']} != {d[2]}"


def test_fingerprints_agree(frames):
    sp, du = frames
    for s, d in zip(sp, du):
        assert s["fp"] == d[3], f"doc {s['doc_id']}"

def test_bigram_pairs_agree(spark):
    """The non-distinct adjacent-bigram expression (bpe_pair_counts) is
    written twice — Spark zip_with and a DuckDB list comprehension —
    so fuzz it on the same adversarial corpus. Order matters here
    (pairs are positional), so compare lists, not sets."""
    import duckdb as _duck

    from venus_spark.functions import bigram_pairs
    from venus_spark.functions.sqlgen import bigram_pairs_sql

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )
    sp = (
        df.select("doc_id", bigram_pairs("text").alias("p"))
        .orderBy("doc_id")
        .collect()
    )
    con = _duck.connect()
    con.register("documents_py", df.toPandas())
    du = con.sql(
        f"SELECT doc_id, {bigram_pairs_sql('text')} AS p "
        "FROM documents_py ORDER BY doc_id"
    ).fetchall()
    for s, d in zip(sp, du):
        assert s["p"] == list(d[1]), f"doc {s['doc_id']}: {s['p']} != {d[1]}"
