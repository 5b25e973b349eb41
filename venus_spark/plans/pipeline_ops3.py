"""Training-data pipeline plans, part 3: the curation stages between raw
corpus and training shards — quality filtering, stratified rebalancing,
benchmark decontamination, k-NN join, embedding near-dup at scale, and
PII scrubbing.

Same discipline as parts 1-2: every plan is built-in column expressions
(no Python in the hot path) and its oracle SQL is generated from the
same constants as the Spark side, so the twins cannot drift silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import cosine, shingles, token_hash31, dround
from venus_spark.functions.sqlgen import (
    cosine_sql,
    dround_sql,
    shingles_sql,
    token_hash31_sql,
    tokens_sql,
)
from venus_spark.operators import similarity as sim
from venus_spark.operators import text as tx
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Quality filter: the keep/drop decision a pretraining pipeline applies
# after scoring (text_quality computes the features; this plan acts on them)
# --------------------------------------------------------------------------

_MIN_TOKENS = 20
_MIN_TTR = 0.30
_MAX_STOP_RATIO = 0.50

_TOKS = tokens_sql("text")
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
    docs = tx.quality_features(load_table(spark, sf_dir, "documents"))
    return docs.filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("type_token_ratio") >= _MIN_TTR)
        & (F.col("stopword_ratio") <= _MAX_STOP_RATIO)
    ).select("doc_id", "lang", "n_tokens")


# --------------------------------------------------------------------------
# Stratified sampling: deterministic hash-based downsampling per stratum
# (rebalance a lang-skewed corpus; reproducible across runs/engines)
# --------------------------------------------------------------------------

# Percent kept per stratum: downsample the dominant language.
_SAMPLE_PCT = {"en": 5}
_SAMPLE_PCT_DEFAULT = 20

_HASH_EXPR = token_hash31_sql("'doc-' || CAST(doc_id AS VARCHAR)")
_STRAT_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {_HASH_EXPR} % 100 <
      CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_PCT.items())}
      ELSE {_SAMPLE_PCT_DEFAULT} END
"""


@plan("stratified_sample", oracle=_STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff
    ``hash(doc_id) % 100 < pct(lang)``. Hash-based (not ``rand()``) so
    the sample is reproducible, stable under retries/restarts, and
    consistent across engines — the property a training-data pipeline
    needs for auditable mixtures. Pure filter: no shuffle, scales as a
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash31(F.concat(F.lit("doc-"), F.col("doc_id").cast("string")))
    pct = F.lit(_SAMPLE_PCT_DEFAULT)
    for lang, p in _SAMPLE_PCT.items():
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return docs.filter((h % 100) < pct).select("doc_id", "lang")


# --------------------------------------------------------------------------
# Benchmark decontamination: flag corpus docs sharing word n-grams with a
# held-out benchmark set (the train/test-leak scrub every LLM corpus runs)
# --------------------------------------------------------------------------

_DECON_N = 5  # word n-gram length
_BENCH_MAX_ID = 20  # doc_id < 20 plays the benchmark set

_DECON_ORACLE = f"""
WITH bench AS (
  SELECT DISTINCT UNNEST({shingles_sql('text', _DECON_N)}) AS g
  FROM documents WHERE doc_id < {_BENCH_MAX_ID}
),
corpus AS (
  SELECT doc_id, UNNEST({shingles_sql('text', _DECON_N)}) AS g
  FROM documents WHERE doc_id >= {_BENCH_MAX_ID}
)
SELECT corpus.doc_id, COUNT(DISTINCT corpus.g) AS n_hit_grams
FROM corpus JOIN bench USING (g)
GROUP BY corpus.doc_id
"""


@plan("decontaminate_ngram", oracle=_DECON_ORACLE)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination check: corpus documents sharing any word
    {n}-gram with the benchmark set, with the overlapping-gram count.
    The benchmark gram set is small by construction (benchmarks are),
    so it broadcasts: the corpus side is one explode + broadcast-hash
    semi-match + partial-agg groupBy — no shuffle of corpus text, no
    quadratic pairing. At 100 TB the broadcast side becomes a bloom
    filter pushed into the scan; the shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") < _BENCH_MAX_ID)
        .select(F.explode(shingles("text", _DECON_N)).alias("g"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") >= _BENCH_MAX_ID).select(
        "doc_id", F.explode(shingles("text", _DECON_N)).alias("g")
    )
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_hit_grams"))
    )


# --------------------------------------------------------------------------
# k-NN join: top-k neighbors for EVERY query vector (batched ANN-baseline)
# --------------------------------------------------------------------------

_KNN_K = 3
_KNN_N_QUERIES = 10  # vec_id < 10 are the queries; the rest is the base

_VD = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_VD.format('embedding')} AS qv
  FROM embeddings WHERE vec_id < {_KNN_N_QUERIES}
),
base AS (
  SELECT vec_id, {_VD.format('embedding')} AS v
  FROM embeddings WHERE vec_id >= {_KNN_N_QUERIES}
),
scored AS (
  SELECT q.query_id, base.vec_id,
         {dround_sql(f'''{cosine_sql('base.v', 'q.qv')}''')} AS cosine_sim
  FROM base CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cosine_sim FROM ranked WHERE rn <= {_KNN_K}
"""


@plan("knn_join_topk", oracle=_KNN_ORACLE)
def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN *join*: exact cosine top-k for every query
    vector in one pass. The query side broadcasts (queries ≪ base), the
    base never shuffles its vectors; per-query top-k is a window over
    the scored pairs, partitioned on query_id. This is the exact
    baseline; at 100 TB the same join runs per-IVF-cluster
    (sim_ivf_topk's pruning applied per query) so each base partition
    only scores the queries probing it."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        sim.as_double(F.col("embedding")).alias("qv"),
    )
    base = emb.filter(F.col("vec_id") >= _KNN_N_QUERIES).select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        dround(cosine(F.col("v"), F.col("qv"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup at scale: RP-LSH bucket as the blocking key
# (the production path; sim_cosine_pairs' label-bucket version is the
#  verification baseline)
# --------------------------------------------------------------------------

# Same threshold as sim_cosine_pairs (the exact label-bucket baseline),
# so the two plans' outputs are directly comparable: pairs the LSH
# blocking recalls vs the baseline's. The synthetic embeddings are
# cluster draws, not literal duplicates, so "near" here is the corpus's
# own top similarity band.
_NEAR_THRESHOLD = 0.35


def _rp_bucket_sql(vec: str) -> str:
    # Generated from the SAME precomputed ±1 weight matrix as
    # similarity.rp_bucket — one constant set, two generators.
    return sim.rp_bucket_sql(vec)


_NEAR_ORACLE = f"""
WITH v AS (
  SELECT vec_id, {_VD.format('embedding')} AS v FROM embeddings
),
b AS (
  SELECT vec_id, v, {_rp_bucket_sql('v')} AS bucket FROM v
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       {dround_sql(f'''{cosine_sql('a.v', 'c.v')}''')} AS cosine_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE {dround_sql(f'''{cosine_sql('a.v', 'c.v')}''')} > {_NEAR_THRESHOLD}
"""


@plan("dedup_embedding_near", oracle=_NEAR_ORACLE)
def dedup_embedding_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with the sign-random-projection
    LSH bucket as the blocking key: candidate pairs only form inside a
    bucket (2^H-fold reduction of the quadratic), then the exact cosine
    verifies. Unlike sim_cosine_pairs (label-bucketed baseline), the
    blocking key here is computable at ingest for any corpus — at scale
    it is the storage partition key and the self-join is co-partitioned,
    shuffle-free."""
    from venus_spark.operators.similarity import cosine_pairs_in_buckets, rp_bucket

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_bucket", rp_bucket(sim.as_double(F.col("embedding")))
    )
    return cosine_pairs_in_buckets(
        emb, bucket_col="_bucket", threshold=_NEAR_THRESHOLD
    )


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
