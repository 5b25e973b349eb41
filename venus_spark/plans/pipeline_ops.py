"""Training-data pipeline plans: text analysis, dedup, similarity search,
multimodal — over the ``documents`` and ``embeddings`` tables.

Each plan's oracle SQL is *generated from the same constants* as the
Spark implementation (marker profiles, stopword lists, hash parameters),
so the two sides cannot drift apart silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum
from venus_spark.functions.sqlgen import (
    davg_sql,
    dround_sql,
    dsum_sql,
    hashed_shingles_sql,
    shingles_sql,
    token_hash31_sql,
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
    docs = tx.lang_hits(tx.with_tokens(load_table(spark, sf_dir, "documents")))
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
# Exact dedup (fingerprint groups)
# --------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = f"""
SELECT {_FINGERPRINT} AS fingerprint, COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_id
FROM documents
GROUP BY fingerprint
HAVING COUNT(*) > 1
"""


@plan("dedup_exact", oracle=_DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups on the canonical md5 fingerprint: one
    hash-partitioned aggregation; uniform hash keys mean no skew at any
    scale."""
    from venus_spark.operators.dedup import exact_dedup_keep_first

    return exact_dedup_keep_first(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Shingle-set Jaccard near-dup pairs within (lang, source) buckets
# --------------------------------------------------------------------------

_JACCARD_T = 0.8
_SHINGLES = shingles_sql("text")

_DEDUP_JACCARD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, {hashed_shingles_sql('text')} AS t
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {dround_sql('''LEN(LIST_INTERSECT(a.t, b.t)) * CAST(1 AS DOUBLE) /
               (LEN(a.t) + LEN(b.t) - LEN(LIST_INTERSECT(a.t, b.t)))''')}
           AS jaccard_sim
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard_sim FROM pairs WHERE jaccard_sim > {_JACCARD_T}
"""


@plan("dedup_jaccard_pairs", oracle=_DEDUP_JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SHINGLE-set Jaccard pairs above threshold within explicit
    (lang, source) buckets — the exhaustive verification baseline for
    the LSH path, on the SAME comparison set the LSH verify uses (word
    3-gram shingles; r3 compared word-token sets, a different metric
    than the one LSH approximates). Served from the prepared MinHash
    index's stored HASHED shingle sets (``_sh_h``) and covered bucket
    keys — one index scan, nothing re-tokenized, no join back to the
    base table, and the quadratic intersects run over int arrays
    instead of ~20-char strings (~3× cheaper per pair). hash31 is
    engine-portable, so the oracle builds the identical hashed sets.
    Bucket keys bound the quadratic pair expansion."""
    from venus_spark.operators.dedup import jaccard_pairs_in_buckets
    from venus_spark.prepared import documents_minhash

    return jaccard_pairs_in_buckets(
        documents_minhash(spark, sf_dir),
        bucket_cols=["lang", "source"],
        threshold=_JACCARD_T,
        toks_col="_sh_h",
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding candidate pairs
# --------------------------------------------------------------------------

def _minhash_oracle() -> str:
    from venus_spark.operators import dedup as dd
    from venus_spark.functions import HASH_P31
    from venus_spark.functions.sqlgen import token_hash31_sql

    mins = ",\n         ".join(
        f"MIN(({dd.PERM_A[i]} * h + {dd.PERM_B[i]}) % {HASH_P31}) AS mh_{i}"
        for i in range(dd.N_PERM)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, MD5(CONCAT_WS('-', "
        + ", ".join(f"mh_{b * dd.ROWS_PER_BAND + r}" for r in range(dd.ROWS_PER_BAND))
        + ")) AS band_hash FROM sig"
        for b in range(dd.N_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_SHINGLES}) AS tok FROM documents
),
h AS (
  SELECT doc_id, {token_hash31_sql('tok')} AS h FROM toks
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM h GROUP BY doc_id
),
bands AS (
{band_selects}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
docsets AS (
  SELECT doc_id, {_SHINGLES} AS t FROM documents
),
verified AS (
  SELECT c.id_a, c.id_b,
         {dround_sql('''LEN(LIST_INTERSECT(x.t, y.t)) * CAST(1 AS DOUBLE) /
               (LEN(x.t) + LEN(y.t) - LEN(LIST_INTERSECT(x.t, y.t)))''')}
           AS jaccard_sim
  FROM cands c
  JOIN docsets x ON c.id_a = x.doc_id
  JOIN docsets y ON c.id_b = y.doc_id
)
SELECT id_a, id_b, jaccard_sim FROM verified WHERE jaccard_sim > {_JACCARD_T}
"""


@plan("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature (one explode + one
    groupBy with MIN aggregates) -> band-bucket candidate join -> exact
    Jaccard verification. Only candidates are ever verified — the LSH
    trick that avoids the quadratic all-pairs pass at scale."""
    from venus_spark.operators.dedup import lsh_near_dup_pairs

    return lsh_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), threshold=_JACCARD_T
    )


@plan("dedup_minhash_lsh_prepared", oracle=_minhash_oracle())
def dedup_minhash_lsh_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as ``dedup_minhash_lsh``, produced from the PREPARED
    MinHash index (signatures + shingle arrays materialized at ingest
    time — venus_spark.prepared.documents_minhash): query time pays
    band expressions + the bucket join + candidate verification only,
    never the corpus-wide signature aggregation. The write-time-index
    posture of the reference's GIN indexes (migration :36-37) applied
    to near-dup search."""
    from venus_spark.operators.dedup import lsh_near_dup_pairs_from_index
    from venus_spark.prepared import documents_minhash

    return lsh_near_dup_pairs_from_index(
        documents_minhash(spark, sf_dir), threshold=_JACCARD_T
    )


@plan("dedup_minhash_lsh_live", oracle=_minhash_oracle())
def dedup_minhash_lsh_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-wide near-dup pass over the LIVE MinHash view (base ∪
    not-yet-merged streaming batches) — so a scheduled dedup run sees
    documents the ingest service landed minutes ago without waiting for
    the next VACUUM merge, completing the live read-path family (BM25 /
    phrase / proximity / boolean / fuzzy-trigram / near-dup all serve
    from base-plus-pending). Degrades to the prepared plan on a
    quiescent corpus under the same oracle; the with-pending half is
    covered by the streaming dedup tests' screen over the same view."""
    from venus_spark.operators.dedup import lsh_near_dup_pairs_from_index
    from venus_spark.prepared import documents_minhash_live

    return lsh_near_dup_pairs_from_index(
        documents_minhash_live(spark, sf_dir), threshold=_JACCARD_T
    )


# --------------------------------------------------------------------------
# SimHash per-document values
# --------------------------------------------------------------------------

def _simhash_oracle() -> str:
    from venus_spark.operators import dedup as dd
    from venus_spark.functions.sqlgen import token_hash31_sql

    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(dd.SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN s_{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_SHINGLES}) AS tok FROM documents
),
h AS (
  SELECT doc_id, {token_hash31_sql('tok')} AS h FROM toks
),
votes AS (
  SELECT doc_id,
         {sums}
  FROM h GROUP BY doc_id
)
SELECT doc_id, {assemble} AS simhash FROM votes
"""


@plan("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash (bit-majority vote over shingle hashes).
    Near-dup pairs then reduce to hamming-distance joins on this value."""
    from venus_spark.operators.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

_QUERY_VEC_ID = 0
_TOPK = 10
_COS_PAIR_T = 0.35

# Cast float[] -> double[] element-wise, exactly as the Spark side does.
_VD = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"


def _cosine_expr_sql(a: str, b: str) -> str:
    from venus_spark.functions.sqlgen import cosine_sql

    return cosine_sql(a, b)


_COSINE_TOPK_ORACLE = f"""
WITH q AS (
  SELECT {_VD.format('embedding')} AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
),
scored AS (
  SELECT e.vec_id,
         {dround_sql(f'''{_cosine_expr_sql(_VD.format('e.embedding'), 'q.qv')}''')} AS cosine_sim
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, cosine_sim FROM scored
ORDER BY cosine_sim DESC, vec_id LIMIT {_TOPK}
"""


@plan("sim_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k — the ANN correctness baseline.
    One scan, O(dim) fold per row in codegen, TakeOrderedAndProject."""
    from venus_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").first()
    query = F.array(*[F.lit(float(x)).cast("double") for x in qrow["embedding"]])
    return brute_force_topk(emb, query, k=_TOPK)


_COSINE_PAIRS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_VD.format('embedding')} AS v FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {dround_sql(f'''{_cosine_expr_sql('a.v', 'b.v')}''')} AS cosine_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {dround_sql(f'''{_cosine_expr_sql('a.v', 'b.v')}''')} > {_COS_PAIR_T}
"""


@plan("sim_cosine_pairs", oracle=_COSINE_PAIRS_ORACLE)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold within label
    buckets (bucketing bounds the quadratic pair expansion; at scale the
    bucket key comes from LSH/IVF instead of a given label)."""
    from venus_spark.operators.similarity import cosine_pairs_in_buckets

    return cosine_pairs_in_buckets(
        load_table(spark, sf_dir, "embeddings"), threshold=_COS_PAIR_T
    )


_IVF_CENTROIDS_ORACLE = f"""
WITH exploded AS (
  SELECT label AS cluster, UNNEST({_VD.format('embedding')}) AS v,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS pos
  FROM embeddings
)
SELECT cluster, pos,
       CAST(FLOOR({dsum_sql('v')} / COUNT(v) * 1000000) AS BIGINT) AS centroid_ppm
FROM exploded GROUP BY cluster, pos
"""


@plan("sim_ivf_centroids", oracle=_IVF_CENTROIDS_ORACLE)
def sim_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer build step: per-cluster mean vector computed
    position-wise (posexplode -> groupBy(cluster,pos)): long-and-narrow
    shuffle, uniform keys. Emitted as floor-ppm for engine-stable values."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.col("label").alias("cluster"),
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        ),
    )
    return exploded.groupBy("cluster", "pos").agg(
        F.floor(dsum("v") / F.count("v") * 1000000).alias("centroid_ppm")
    )
