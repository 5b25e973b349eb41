"""Training-data pipeline plans: text quality, language ID, document
fingerprinting, and token counting — over the ``documents`` table.

Each plan's oracle SQL is *generated from the same constants* as the
Spark implementation (marker profiles, stopword lists, hash
parameters), so the two sides cannot drift apart silently.

(Moved verbatim from the accreted pipeline_ops module in the r14
domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import bigram_pairs, davg, dround, tokens
from venus_spark.functions.sqlgen import (
    bigram_pairs_sql,
    davg_sql,
    dround_sql,
    tokens_sql,
)
from venus_spark.operators import text as tx
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# SQL twins of the text operators (same constants as operators/text.py)
# --------------------------------------------------------------------------

_TOKS = tokens_sql("text")


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_N_TOKENS = f"LEN({_TOKS})"
_N_STOP = f"LEN(LIST_FILTER({_TOKS}, t -> LIST_CONTAINS({_sql_list(tx.STOPWORDS)}, t)))"
_N_DISTINCT = f"LEN(LIST_DISTINCT({_TOKS}))"
_TOTAL_LEN = f"LIST_SUM(LIST_TRANSFORM({_TOKS}, t -> LENGTH(t)))"

_TTR = f"{dround_sql(f'{_N_DISTINCT} * CAST(1 AS DOUBLE) / {_N_TOKENS}')}"
_STOP_RATIO = f"{dround_sql(f'{_N_STOP} * CAST(1 AS DOUBLE) / {_N_TOKENS}')}"
_MEAN_LEN = f"{dround_sql(f'{_TOTAL_LEN} * CAST(1 AS DOUBLE) / {_N_TOKENS}')}"

from venus_spark.functions import WHITESPACE_CLASS as _WS

_FINGERPRINT = f"MD5(TRIM(REGEXP_REPLACE(LOWER(text), '{_WS}+', ' ', 'g')))"


def _lang_hits_sql(markers: tuple[str, ...]) -> str:
    return f"LEN(LIST_FILTER({_TOKS}, t -> LIST_CONTAINS({_sql_list(markers)}, t)))"


def _predicted_lang_sql() -> str:
    best = "GREATEST(" + ", ".join(f"hits_{lang}" for lang, _ in tx.LANG_PROFILES) + ")"
    whens = "\n       ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang, _ in tx.LANG_PROFILES
    )
    return f"CASE WHEN {best} = 0 THEN 'und'\n       {whens}\n       ELSE 'und' END"


# --------------------------------------------------------------------------
# Text quality scoring (per document)
# --------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, {_N_TOKENS} AS n_tokens, {_TTR} AS type_token_ratio,
         {_STOP_RATIO} AS stopword_ratio, {_MEAN_LEN} AS mean_token_len
  FROM documents
)
SELECT doc_id, n_tokens, type_token_ratio, stopword_ratio, mean_token_len,
       CAST(FLOOR((0.4 * type_token_ratio
           + 0.4 * LEAST(stopword_ratio * 4, CAST(1 AS DOUBLE))
           + 0.2 * LEAST(mean_token_len / 8, CAST(1 AS DOUBLE))) * 1000000) AS BIGINT)
         AS quality_score_ppm
FROM feat
"""


@plan("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score — the cheap
    pre-filter pass of a pretraining pipeline. Pure column expressions:
    one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return tx.quality_features(docs).select(
        "doc_id",
        "n_tokens",
        "type_token_ratio",
        "stopword_ratio",
        "mean_token_len",
        tx.quality_score_col().alias("quality_score_ppm"),
    )


# --------------------------------------------------------------------------
# Language identification (marker-word heuristic)
# --------------------------------------------------------------------------

_LANG_ID_ORACLE = f"""
WITH hits AS (
  SELECT lang,
         {", ".join(f"{_lang_hits_sql(m)} AS hits_{l}" for l, m in tx.LANG_PROFILES)}
  FROM documents
)
SELECT lang AS actual_lang, {_predicted_lang_sql()} AS predicted_lang,
       COUNT(*) AS n_docs
FROM hits
GROUP BY actual_lang, predicted_lang
"""


@plan("lang_id", oracle=_LANG_ID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-word profiles) vs the labeled lang —
    a confusion-matrix aggregation. Scan + tiny-key groupBy only."""
    docs = tx.lang_hits(tx.with_tokens(load_table(spark, sf_dir, "documents", fanned=True)))
    return (
        docs.select(
            F.col("lang").alias("actual_lang"),
            tx.predicted_lang_col().alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Document fingerprinting (normalized md5) per source
# --------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT {_FINGERPRINT}) AS n_unique
FROM documents GROUP BY source
"""


@plan("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text md5 fingerprint; per-source distinct counts expose
    exact-duplicate density."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", tx.fingerprint_col())
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("fp").alias("n_unique"))
    )


# --------------------------------------------------------------------------
# Token counting per language
# --------------------------------------------------------------------------

_TOKEN_COUNT_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM({_N_TOKENS}) AS BIGINT) AS total_tokens,
       {davg_sql(_N_TOKENS)} AS avg_tokens
FROM documents GROUP BY lang
"""


@plan("token_count_by_lang", oracle=_TOKEN_COUNT_ORACLE)
def token_count_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token counts (the BPE-proxy budget metric) per language."""
    docs = tx.with_tokens(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        davg("n_tokens").alias("avg_tokens"),
    )


# A BPE-ish pre-tokenizer: words / digit runs / punctuation runs, each
# optionally absorbing one leading space — the shape of GPT-style
# pre-tokenization, portable between Java regex (Spark) and RE2 (DuckDB).
# The whitespace class is spelled out because \s differs between the two
# engines (Java includes \x0B, RE2's \s does not).
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+"

_N_BPE = f"LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_PATTERN}'))"

_TOKEN_BPE_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM({_N_BPE}) AS BIGINT) AS total_bpe_tokens,
       {davg_sql(_N_BPE)} AS avg_bpe_tokens
FROM documents GROUP BY lang
"""


@plan("token_count_bpe", oracle=_TOKEN_BPE_ORACLE)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token budget per language via the BPE-style
    pre-tokenizer regex — the second half of the token-counting surface
    (whitespace tokens in token_count_by_lang). One scan, tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
    return (
        docs.withColumn("n_bpe", n_bpe)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            davg("n_bpe").alias("avg_bpe_tokens"),
        )
    )



# --------------------------------------------------------------------------
# Quality filter: the keep/drop decision a pretraining pipeline applies
# after scoring (text_quality computes the features; this plan acts on them)
# --------------------------------------------------------------------------

_MIN_TOKENS = 20
_MIN_TTR = 0.30
_MAX_STOP_RATIO = 0.50

_QF_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, lang, LEN({_TOKS}) AS n_tokens,
         {dround_sql(f'LEN(LIST_DISTINCT({_TOKS})) * CAST(1 AS DOUBLE) / LEN({_TOKS})')} AS ttr,
         {dround_sql(f'''LEN(LIST_FILTER({_TOKS},
               t -> LIST_CONTAINS({[*tx.STOPWORDS]!r}, t))) * CAST(1 AS DOUBLE)
               / LEN({_TOKS})''')} AS stop_ratio
  FROM documents
)
SELECT doc_id, lang, n_tokens
FROM feat
WHERE n_tokens >= {_MIN_TOKENS} AND ttr >= {_MIN_TTR}
  AND stop_ratio <= {_MAX_STOP_RATIO}
"""


@plan("quality_filter", oracle=_QF_ORACLE)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep side of the quality gate: documents passing the
    min-tokens / type-token-ratio / stopword-ratio thresholds. One scan,
    predicate fully in codegen — at 100 TB this is the pass that decides
    what the rest of the pipeline ever touches, so it must stay a
    straight filter (it does: no shuffle, no Python)."""
    # Tokenize-once barrier tried and REJECTED (r16, REPEAT=3
    # interleaved): the gate predicates re-inline the tokenizer (14
    # split() copies per row), but across the fanned 32-slot scan the
    # duplicate splits are cheaper than the ckpt barrier + cache pass
    # (0.83 s -> 0.99 s). The curated funnel keeps the barrier because
    # TWO corpus-sized legs (quality + 5-gram decontam explode) share
    # it there; standalone, this stays the straight filter.
    docs = tx.quality_features(load_table(spark, sf_dir, "documents", fanned=True))
    return docs.filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("type_token_ratio") >= _MIN_TTR)
        & (F.col("stopword_ratio") <= _MAX_STOP_RATIO)
    ).select("doc_id", "lang", "n_tokens")


# --------------------------------------------------------------------------
# PII scrubbing: regex redaction of emails / phone numbers
# --------------------------------------------------------------------------

# The synthetic corpus carries no PII, so the plan first composes a
# deterministic contact line per document (same construction both sides),
# then scrubs it — the redaction logic is what's under test. The md5 of
# the scrubbed text proves byte-identical replacement output.
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"

_PII_ORACLE = f"""
WITH composed AS (
  SELECT doc_id,
         text || ' contact ' || source || '@example.com tel 555-'
              || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS full_text
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
         LEN(REGEXP_EXTRACT_ALL(full_text, '{_EMAIL_RE}')) AS n_emails,
         LEN(REGEXP_EXTRACT_ALL(full_text, '{_PHONE_RE}')) AS n_phones,
         REGEXP_REPLACE(REGEXP_REPLACE(full_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM composed
)
SELECT doc_id, n_emails, n_phones, MD5(clean) AS clean_md5
FROM scrubbed
"""


@plan("pii_scrub", oracle=_PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and replace email/phone matches with
    placeholder tokens. Pure regexp_replace/regexp_count column
    expressions (Java regex ≡ RE2 on this pattern class) — one scan,
    codegen, embarrassingly parallel; the md5 output column certifies
    the scrubbed bytes, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.col("source"),
        F.lit("@example.com tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    composed = docs.select("doc_id", full.alias("full_text"))
    clean = F.regexp_replace(
        F.regexp_replace("full_text", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return composed.select(
        "doc_id",
        F.regexp_count("full_text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("full_text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style): duplicate word-3-gram fraction and
# top-token mass per document. High values flag boilerplate / template /
# degenerate text that slips past vocabulary-level quality gates.
# --------------------------------------------------------------------------

# Non-distinct word 3-grams: same construction as functions.shingles but
# KEEPING duplicates — the duplicate fraction is the signal here.
_GRAMS = (
    f"(CASE WHEN LEN({_TOKS}) >= 3 THEN "
    f"[ARRAY_TO_STRING(({_TOKS})[i:i+2], ' ') FOR i IN RANGE(1, LEN({_TOKS}) - 1)] "
    f"ELSE [ARRAY_TO_STRING({_TOKS}, ' ')] END)"
)

_REP_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         {dround_sql(f'CAST(1 AS DOUBLE) - LEN(LIST_DISTINCT({_GRAMS})) * CAST(1 AS DOUBLE) / LEN({_GRAMS})')}
           AS dup_3gram_frac
  FROM documents
),
tok AS (SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
mass AS (
  SELECT doc_id, {dround_sql('MAX(c) * CAST(1 AS DOUBLE) / SUM(c)')} AS top_token_mass
  FROM cnt GROUP BY doc_id
)
SELECT g.doc_id, g.dup_3gram_frac, m.top_token_mass
FROM grams g JOIN mass m USING (doc_id)
ORDER BY doc_id
"""


def _ngrams_keep_dups(col: str, n: int = 3):
    # Same zipped-slices construction as functions.shingles (see its
    # docstring for why), minus the distinct.
    t = tokens(col)
    cnt = F.size(t) - (n - 1)
    grams = F.slice(t, 1, cnt)
    for k in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(t, k, cnt), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.when(F.size(t) >= n, grams).otherwise(F.array(F.concat_ws(" ", t)))


@plan("quality_repetition", oracle=_REP_ORACLE)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: fraction of duplicate word-3-grams
    (array exprs, zero shuffle) and the mass of the single most frequent
    token (explode -> two partially-aggregated groupBys on doc_id — the
    shape that handles million-token documents, where a per-row quadratic
    count-each-distinct expression would not). The doc_id join is on a
    uniform key."""
    docs = load_table(spark, sf_dir, "documents", fanned=True)
    # Two branches joined on doc_id, deliberately: folding the dup
    # fraction into the explode pipeline looks join-free but makes
    # Catalyst push the O(tokens) gram expression BELOW the Generate,
    # recomputing it once per exploded token instead of once per doc
    # (measured ~2x slower end-to-end at sf0.1). The join key is the
    # uniform doc id. The gram array is materialized once per row —
    # inlining it into both size() calls builds it twice (no CSE
    # across the conditional).
    dup = docs.select("doc_id", _ngrams_keep_dups("text").alias("g")).select(
        "doc_id",
        dround(
            F.lit(1).cast("double") - F.size(F.array_distinct("g")) * F.lit(1).cast("double") / F.size("g")).alias("dup_3gram_frac"),
    )
    cnt = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    mass = cnt.groupBy("doc_id").agg(
        dround(F.max("c") * F.lit(1).cast("double") / F.sum("c")).alias("top_token_mass")
    )
    return dup.join(mass, "doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# Corpus health report: per (source, lang) — volume, mean length, and the
# share of documents passing the part-3 quality gate. The one-screen
# rollup a curation run is judged by.
# --------------------------------------------------------------------------

_STOP_RATIO_RAW = (
    f"LEN(LIST_FILTER({_TOKS},"
    f" t -> LIST_CONTAINS({[*tx.STOPWORDS]!r}, t))) * CAST(1 AS DOUBLE)"
    f" / LEN({_TOKS})"
)
_PASS_SQL = (
    f"LEN({_TOKS}) >= {_MIN_TOKENS}"
    f" AND {dround_sql(f'LEN(LIST_DISTINCT({_TOKS})) * CAST(1 AS DOUBLE) / LEN({_TOKS})')} >= {_MIN_TTR}"
    f" AND {dround_sql(_STOP_RATIO_RAW)} <= {_MAX_STOP_RATIO}"
)

_REPORT_ORACLE = f"""
SELECT source, lang,
       COUNT(*) AS n_docs,
       {davg_sql('n_chars')} AS mean_chars,
       {dround_sql(f'SUM(CASE WHEN {_PASS_SQL} THEN 1 ELSE 0 END) * CAST(1 AS DOUBLE) / COUNT(*)')}
         AS pass_share
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


@plan("corpus_report", oracle=_REPORT_ORACLE)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang) curation rollup: doc counts, mean char length
    (decimal-accumulated), and the share passing the quality gate. One
    scan, one partial-aggregated groupBy on low-cardinality keys — the
    100 TB shape (the gate predicate is evaluated inline in the scan
    projection, not via a join against quality_filter output)."""
    docs = tx.quality_features(load_table(spark, sf_dir, "documents"))
    passed = (
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("type_token_ratio") >= _MIN_TTR)
        & (F.col("stopword_ratio") <= _MAX_STOP_RATIO)
    )
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            davg("n_chars").alias("mean_chars"),
            dround(
                F.sum(F.when(passed, 1).otherwise(0)) * F.lit(1).cast("double") / F.count("*")).alias("pass_share"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# Length histogram: per-lang doc-length distribution in fixed-width
# buckets — the standard first look at a new corpus drop.
# --------------------------------------------------------------------------

_BUCKET_WIDTH = 50

_HIST_ORACLE = f"""
SELECT lang,
       CAST(FLOOR(n_chars / {_BUCKET_WIDTH}) AS BIGINT) * {_BUCKET_WIDTH}
         AS bucket_lo,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, bucket_lo
ORDER BY lang, bucket_lo
"""


@plan("length_histogram", oracle=_HIST_ORACLE)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length histogram per language: fixed-width char buckets with
    counts and per-bucket extrema. Pure partial-aggregated groupBy on
    (lang, bucket) — embarrassingly parallel at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.floor(F.col("n_chars") / _BUCKET_WIDTH).cast("long") * _BUCKET_WIDTH
    ).alias("bucket_lo")
    return (
        docs.groupBy("lang", bucket)
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "bucket_lo")
    )


# --------------------------------------------------------------------------
# Bigram-LM quality score: per-document mean log-probability under an
# add-one-smoothed corpus bigram model — the in-engine analog of the
# KenLM perplexity gate (CCNet-style) every pretraining pipeline runs.
# --------------------------------------------------------------------------

# P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). All inputs are exact BIGINT
# aggregates, so the double math below evaluates the identical tree on
# both engines; rounded to 6 dp so the per-doc mean can use the exact
# decimal accumulator.
_LM_SCORE = f"{dround_sql('LN((c_big + CAST(1 AS DOUBLE)) / (c_uni + v))')}"

_BIGRAMS = bigram_pairs_sql("text")

_LM_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST({_TOKS}) AS tok FROM documents
),
uni AS (SELECT tok, COUNT(*) AS c_uni FROM toks GROUP BY tok),
vocab AS (SELECT COUNT(*) AS v FROM uni),
bigs AS (
  SELECT doc_id, UNNEST({_BIGRAMS}) AS g FROM documents
),
bigc AS (SELECT g, COUNT(*) AS c_big FROM bigs GROUP BY g),
scored AS (
  SELECT bigs.doc_id, {_LM_SCORE} AS lp
  FROM bigs
  JOIN bigc USING (g)
  JOIN uni ON SPLIT_PART(g, ' ', 1) = uni.tok
  CROSS JOIN vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams, {davg_sql('lp')} AS avg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@plan("lm_quality", oracle=_LM_ORACLE)
def lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-prob under the corpus's own add-one
    bigram LM — low scores flag gibberish/degenerate text that
    vocabulary-ratio gates miss. Two corpus passes build the model
    (bigram + unigram counts, both partial-aggregated on uniform
    string keys); scoring joins each document's bigrams to the model.
    Only the 1-row vocab scalar is force-broadcast. The unigram join
    is left to AQE: vocabulary grows with the corpus (Heaps' law), so
    at 100 TB it must be allowed to shuffle — AQE broadcasts it while
    it fits and splits the skewed head tokens ("the") otherwise. The
    bigram join shuffles on the bigram string — uniform by
    construction. No Python, no windows, no driver materialization."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c_uni"))
    vocab = uni.agg(F.count("*").alias("v"))
    # bigs feeds the model counts AND the scoring join; the lazy
    # checkpoint makes the bigram tokenize+explode run once instead of
    # twice (r15) — with the unigram pass that is 2 corpus tokenizations
    # total, down from 3. MEMORY_AND_DISK holds the exploded (doc_id, g)
    # stream; at scale that copy is the price of not re-shingling the
    # corpus.
    from venus_spark.lineage import ckpt

    bigs = ckpt(
        docs.select("doc_id", F.explode(bigram_pairs("text")).alias("g"))
    )
    bigc = bigs.groupBy("g").agg(F.count("*").alias("c_big"))
    scored = (
        bigs.join(bigc, "g")
        .withColumn("tok", F.expr("substring_index(g, ' ', 1)"))
        .join(uni, "tok")
        .crossJoin(F.broadcast(vocab))
        .withColumn("lp", F.expr(_LM_SCORE))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), davg("lp").alias("avg_logp"))
        .orderBy("doc_id")
    )


