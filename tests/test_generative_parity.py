"""Generative (Hypothesis) cross-engine parity for the shared kernels.

The fixed adversarial lists in test_text_parity_fuzz.py pin known
edge classes; these tests let Hypothesis search for new ones in the
text kernels (tokens / shingles / fingerprint) and the float fold
kernels (dot / cosine / l2sq) that every dedup, retrieval, and ANN
plan is built on.

Contract alphabet: the parity contract covers the engines' COMMON
casefold semantics. Two unicode classes are excluded because Spark
(JVM String.toLowerCase, locale-independent) and DuckDB (utf8proc)
genuinely disagree on them — discovered by this suite's own probe:

- U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE: Spark lowercases to
  'i' + U+0307 combining dot; DuckDB to plain 'i'.
- U+03A3 GREEK CAPITAL SIGMA: DuckDB applies the context-dependent
  final-sigma rule (word-final Σ → ς); Spark maps every Σ → σ.

Corpus text contains neither; plans that lowercase (fingerprint, BM25,
tf-idf) document byte-level lowercase parity over this contract set.
Everything else — ASCII, whitespace controls, Latin-1, precomposed
accents, CJK, Hangul, Cyrillic, lowercase Greek, emoji, regex
metacharacters — is in scope and generated freely.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\x0b\f\r"
    ".,;:!?-_()[]{}|^$*+\\'\"`~@#%&<>/="
    "àâäéèêëïîôöùûüçñßẞæÆøØåÅ"
    "東京中文日本語テスト한국어русскийαβγδσς"
    "🚀✨"
)

texts_strategy = st.lists(
    st.text(alphabet=ALPHABET, max_size=60), min_size=1, max_size=30
)

FUZZ_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@FUZZ_SETTINGS
@given(texts=texts_strategy)
def test_text_kernels_agree(spark, con, texts):
    from pyspark.sql import functions as F

    from venus_spark.functions import shingles, tokens
    from venus_spark.functions.sqlgen import shingles_sql, tokens_sql
    from venus_spark.operators.text import fingerprint_col

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
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
    con.register("gen_docs", df.toPandas())
    from venus_spark.plans.pipeline_quality import _FINGERPRINT as fp_sql

    du = con.sql(
        f"SELECT doc_id, {tokens_sql('text')} AS toks, "
        f"{shingles_sql('text')} AS sh, {fp_sql} AS fp "
        f"FROM gen_docs ORDER BY doc_id"
    ).fetchall()
    for s, d in zip(sp, du):
        assert s["toks"] == list(d[1]), (s["doc_id"], texts[s["doc_id"]])
        # shingle parity is a SET contract (DuckDB's LIST_DISTINCT does
        # not preserve order; every consumer treats shingles as a set)
        assert set(s["sh"]) == set(d[2]), (s["doc_id"], texts[s["doc_id"]])
        assert s["fp"] == d[3], (s["doc_id"], texts[s["doc_id"]])


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=64,
        ),
        min_size=4,
        max_size=4,
    ),
    min_size=2,
    max_size=16,
)


@FUZZ_SETTINGS
@given(vecs=vec_strategy)
def test_float_fold_kernels_bit_equal(spark, con, vecs):
    """dot / cosine / l2sq must come out BIT-equal (no rounding slack):
    the whole PQ/ANN parity story rests on the left-fold order being
    identical in Spark's aggregate, DuckDB's LIST_REDUCE, and the
    driver-side Python fold."""
    from pyspark.sql import functions as F

    from venus_spark.functions import cosine, dot, l2sq
    from venus_spark.functions.sqlgen import cosine_sql, dot_sql, l2sq_sql

    q = vecs[0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>"
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    sp = (
        df.select(
            "vec_id",
            dot(F.col("v"), qlit).alias("d"),
            cosine(F.col("v"), qlit).alias("c"),
            l2sq(F.col("v"), qlit).alias("l"),
        )
        .orderBy("vec_id")
        .collect()
    )
    con.register("gen_vecs", df.toPandas())
    from venus_spark.functions.sqlgen import double_array_sql

    qsql = double_array_sql(q)
    du = con.sql(
        f"SELECT vec_id, {dot_sql('v', qsql)} AS d, "
        f"{cosine_sql('v', qsql)} AS c, {l2sq_sql('v', qsql)} AS l "
        f"FROM gen_vecs ORDER BY vec_id"
    ).fetchall()
    for s, d in zip(sp, du):
        assert s["d"] == d[1], ("dot", s["vec_id"])
        assert s["c"] == d[2] or (s["c"] is None and d[2] is None), (
            "cosine",
            s["vec_id"],
        )
        assert s["l"] == d[3], ("l2sq", s["vec_id"])


series_strategy = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=20,
)


@FUZZ_SETTINGS
@given(xs=series_strategy)
def test_ewma_fold_bit_equal(spark, con, xs):
    """The EWMA recursion (ewma_smoothing) must fold bit-identically in
    Spark's aggregate (NULL-seeded, first element wins), DuckDB's
    LIST_REDUCE (seeds with element 1), and the driver-side Python
    fold the unit test recomputes with — same three-way contract as
    the dot/l2sq kernels."""
    from pyspark.sql import functions as F

    from venus_spark.functions import ewma_fold
    from venus_spark.functions.sqlgen import double_array_sql, ewma_fold_sql
    from venus_spark.plans.pipeline_behavioral import _EWMA_A as a

    # both sides exercise the PRODUCTION kernels, not a local rewrite
    du = con.sql(
        f"SELECT {ewma_fold_sql(double_array_sql(xs), a)} AS e"
    ).fetchone()[0]

    acc = None
    for x in xs:
        acc = x if acc is None else a * x + (1 - a) * acc

    arr = F.array(*[F.lit(float(x)) for x in xs])
    sp = spark.range(1).select(ewma_fold(arr, a).alias("e")).first()["e"]
    assert sp == du == acc, (sp, du, acc, xs)


@FUZZ_SETTINGS
@given(texts=texts_strategy)
def test_winnowing_and_trigram_kernels_agree(spark, con, texts):
    """Round-6 kernels under the same searchlight: the winnowing digest
    (ordered k-gram hashes -> windowed minima -> distinct selected set)
    and the character-trigram set must agree cross-engine on arbitrary
    contract-alphabet text — both are SET contracts (LIST_DISTINCT does
    not promise order), with n_grams pinned exactly. The SQL side is
    the PRODUCTION oracle fragment (winnow_sel_sql), not a copy, so the
    fuzz cannot drift from what the plans ship."""
    from venus_spark.functions.sqlgen import char_trigrams_sql
    from venus_spark.operators.text import char_trigrams
    from venus_spark.plans.pipeline_decontam import winnow_fingerprints, winnow_sel_sql

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    sp = {
        r["doc_id"]: r
        for r in winnow_fingerprints(df)
        .join(df.select("doc_id", char_trigrams("text").alias("trg")), "doc_id")
        .collect()
    }
    con.register("gen_docs2", df.toPandas())
    du = con.sql(
        f"""
        SELECT s.doc_id, s.n_grams, s.fps, {char_trigrams_sql('g.text')} AS trg
        FROM {winnow_sel_sql('gen_docs2')} s
        JOIN gen_docs2 g USING (doc_id)
        ORDER BY s.doc_id
        """
    ).fetchall()
    for doc_id, n_grams, fps, trg in du:
        s = sp[doc_id]
        assert s["n_grams"] == n_grams, texts[doc_id]
        assert set(s["fps"]) == set(fps), texts[doc_id]
        assert set(s["trg"]) == set(trg), texts[doc_id]


# --------------------------------------------------------------------------
# jsonb-GIN analog: the kv-postings derivation vs the oracle's
# composed-keys branches (round 8 — the containment/key plans all ride
# on _events_kv_rows, so its presence semantics must match the SQL the
# driver executes on arbitrary inputs, not just the testdata shapes).
# k values are integers-or-absent: the established parity contract
# (CAST to INTEGER diverges on non-numeric strings — Spark yields NULL,
# DuckDB raises — and no plan feeds it those).
# --------------------------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.text("abcXYZ_ ", max_size=5)),  # event_type
        st.integers(min_value=-20, max_value=20),  # user_id
        st.one_of(st.none(), st.integers(min_value=-5, max_value=99)),  # k
        st.booleans(),  # props column NULL entirely
    ),
    min_size=1,
    max_size=25,
)


@FUZZ_SETTINGS
@given(rows=events_strategy)
def test_kv_postings_rows_agree_with_oracle_branches(spark, con, rows):
    import json as _json

    from venus_spark.prepared import _events_kv_rows

    data = []
    for i, (etype, user, k, null_props) in enumerate(rows):
        props = (
            None
            if null_props
            else _json.dumps({"k": k} if k is not None else {})
        )
        data.append((i, etype, user, props))
    df = spark.createDataFrame(
        data, "event_id long, event_type string, user_id long, props string"
    )
    got = sorted(tuple(r) for r in _events_kv_rows(df).collect())
    con.register("gen_ev", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            WITH k AS (
              SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv_k,
                     event_type, user_id
              FROM gen_ev
            )
            SELECT 'k=' || CAST(kv_k AS VARCHAR) AS kv, event_id FROM k
              WHERE kv_k IS NOT NULL
            UNION ALL SELECT 'type=' || event_type, event_id FROM k
              WHERE event_type IS NOT NULL
            UNION ALL SELECT 'uid=' || CAST(user_id AS VARCHAR), event_id
              FROM k WHERE user_id % 3 != 0
            UNION ALL SELECT '?k', event_id FROM k WHERE kv_k IS NOT NULL
            UNION ALL SELECT '?type', event_id FROM k
              WHERE event_type IS NOT NULL
            UNION ALL SELECT '?uid', event_id FROM k WHERE user_id % 3 != 0
            """
        ).fetchall()
    )
    assert got == want
