"""Training-data pipeline plans, part 7: leakage-free split assignment,
a corpus bigram-LM quality score (the KenLM-perplexity analog), event
inter-arrival statistics, and z-score anomaly ranking over the hourly
time series.

Same discipline as parts 1-6: built-in column expressions only (no
Python in the data path); every parity-sensitive scalar formula is ONE
shared SQL string handed to Spark via ``F.expr`` and to DuckDB
verbatim; aggregate means go through the exact decimal accumulator
(:func:`venus_spark.functions.davg`) so summation order cannot matter;
integer aggregates that feed double math are exact on both engines.

Reference tie-in: the reference's analytics surface is documented SQL
over PostgreSQL (`/root/reference/README.rst:82-107`); anomaly ranking
and inter-arrival gaps are the time-series queries a centralised
logging service runs over its hypertables, and split/LM-score are the
curation extensions the north star asks for (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import bigram_pairs, davg, fmt_ts, token_hash31, tokens
from venus_spark.functions.sqlgen import (
    bigram_pairs_sql,
    davg_sql,
    dround_sql,
    fmt_ts_sql,
    token_hash31_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Leakage-free split assignment: train/val/test by key hash, with the
# per-(split, source) accounting a dataset card reports. Hash-based (not
# rand()) so the split is reproducible, stable under retries, and a
# document can never migrate between splits across runs/engines.
# --------------------------------------------------------------------------

_TRAIN_PCT = 80  # [0, 80) -> train
_VAL_PCT = 90  # [80, 90) -> val, [90, 100) -> test

_TOKS = tokens_sql("text")
_SPLIT_HASH = f"({token_hash31_sql(chr(39) + 'split-' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} % 100)"
_SPLIT_CASE = (
    f"CASE WHEN {_SPLIT_HASH} < {_TRAIN_PCT} THEN 'train' "
    f"WHEN {_SPLIT_HASH} < {_VAL_PCT} THEN 'val' ELSE 'test' END"
)

_SPLIT_ORACLE = f"""
SELECT {_SPLIT_CASE} AS split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN({_TOKS})) AS BIGINT) AS total_tokens,
       {davg_sql(f'LEN({_TOKS})')} AS mean_tokens
FROM documents
GROUP BY split, source
ORDER BY split, source
"""


@plan("split_assignment", oracle=_SPLIT_ORACLE)
def split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: ``hash('split-'||doc_id) %
    100`` against fixed cut points, rolled up per (split, source) with
    doc and token accounting. The salt prefix decorrelates this hash
    from the sampling hash (stratified_sample) so membership in one
    never biases the other. One scan + one tiny groupBy — the split
    decision itself never shuffles, which is what lets the same
    assignment run as a filter inside any downstream plan at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash31(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(h < _TRAIN_PCT, "train").when(h < _VAL_PCT, "val").otherwise("test")
    )
    n_tok = F.size(tokens("text"))
    return (
        docs.select(split.alias("split"), "source", n_tok.alias("n_tok"))
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            davg("n_tok").alias("mean_tokens"),
        )
        .orderBy("split", "source")
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
    bigs = docs.select("doc_id", F.explode(bigram_pairs("text")).alias("g"))
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


# --------------------------------------------------------------------------
# Document chunking: fixed-size token windows with stride/overlap — the
# context-window split every pretraining/RAG pipeline applies before
# tokenized examples are packed (pack_sequences is the downstream twin).
# --------------------------------------------------------------------------

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
starts AS (
  SELECT doc_id, toks,
         UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks), 1), {_CHUNK_STRIDE}))
           AS start_tok
  FROM t
)
SELECT doc_id,
       CAST((start_tok - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       start_tok,
       LEAST({_CHUNK_TOKENS}, LEN(toks) - start_tok + 1) AS n_tok,
       MD5(ARRAY_TO_STRING(toks[start_tok:start_tok + {_CHUNK_TOKENS} - 1], ' '))
         AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_idx
"""


@plan("doc_chunking", oracle=_CHUNK_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks per document ({chunk} tokens,
    stride {stride}). The start positions come from one sequence()
    expression and the chunk content is fingerprinted (md5 of the
    joined slice) so the oracle verifies the actual text windows, not
    just the geometry. Pure array expressions + one explode — no
    shuffle at all until the output sort; a zero-token document still
    yields exactly one (empty) chunk on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("toks"), F.lit(1)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start_tok"),
    )
    return starts.select(
        "doc_id",
        ((F.col("start_tok") - 1) / F.lit(_CHUNK_STRIDE)).cast("long").alias("chunk_idx"),
        "start_tok",
        F.least(
            F.lit(_CHUNK_TOKENS), F.size("toks") - F.col("start_tok") + 1
        ).alias("n_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("start_tok"), F.lit(_CHUNK_TOKENS)))
        ).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# Event inter-arrival gaps: lag() over per-user event streams, rolled up
# per event type — the "how bursty is this signal" query, and the B17
# family's lead/lag coverage.
# --------------------------------------------------------------------------

# Gap in integer microseconds (exact on both engines), rendered to
# seconds through one shared rounding expression.
_GAP_S = f"{dround_sql('gap_us / CAST(1000000 AS DOUBLE)')}"

_GAPS_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type, COUNT(*) AS n_gaps,
       {davg_sql(_GAP_S)} AS avg_gap_s,
       MAX({_GAP_S}) AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@plan("event_gap_stats", oracle=_GAPS_ORACLE)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival statistics: lag(ts) over (partition by
    user order by ts, event_id) — the window partitions on the uniform
    user key, so no single partition ever exceeds one user's history;
    the rollup after it is a tiny groupBy. Gaps are computed in exact
    integer microseconds and converted once, so both engines round the
    identical quotient. The event_id tiebreak makes lag() well-defined
    under equal timestamps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in parquet; the session tz is UTC so the cast
    # is value-preserving and matches DuckDB's naive EPOCH_US.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        ev.select(
            "event_type", (us - F.lag(us).over(w)).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
        .withColumn("gap_s", F.expr(_GAP_S))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            davg("gap_s").alias("avg_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Z-score anomaly ranking: hourly counts per event type scored against
# that type's own mean/stddev, top-3 most anomalous buckets per type —
# the alerting query a logging service runs over its hypertable
# (reference surface: README.rst:82-107 time-bucketed aggregates).
# --------------------------------------------------------------------------

_ANOM_TOPK = 3

# Welford-free variance from exact integer aggregates: n, s1 = sum(c),
# s2 = sum(c*c) are all BIGINT-exact, so the double expression below is
# the identical tree on both engines.
# CAST AS DOUBLE, not `* 1.0`: an exact-numeric literal parses as
# DECIMAL on both engines and their decimal division scale rules
# differ (measured: a 6dp-boundary z diverged); the cast keeps every
# op in IEEE double where the engines agree bit-for-bit. The CASE
# guard matters under Spark's default ANSI mode, where a one-bucket or
# zero-variance series would make the division a runtime ERROR, not a
# NULL (the guard compares in double so it cannot overflow at scale).
_Z_RAW = (
    "(c - CAST(s1 AS DOUBLE) / n)"
    " / SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))"
)
_Z_SCORE = (
    "CASE WHEN n > 1 AND CAST(s2 AS DOUBLE) * n > CAST(s1 AS DOUBLE) * s1 THEN "
    + dround_sql(_Z_RAW)
    + " ELSE CAST(NULL AS DOUBLE) END"
)

_ANOM_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS b, COUNT(*) AS c
  FROM events GROUP BY event_type, b
),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
  FROM hourly GROUP BY event_type
),
z AS (
  SELECT hourly.event_type, b, c, {_Z_SCORE} AS z
  FROM hourly JOIN stats USING (event_type)
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY ABS(z) DESC NULLS LAST, b) AS rn
  FROM z
)
SELECT event_type, {fmt_ts_sql('b', micros=False)} AS bucket, c, z
FROM r WHERE rn <= {_ANOM_TOPK}
ORDER BY event_type, bucket
"""


@plan("timeseries_anomaly", oracle=_ANOM_ORACLE)
def timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most anomalous hours per event type by |z| against the
    type's own hourly-count distribution. The raw scan partial-aggs to
    one row per (type, hour) before anything else happens, so the
    window and the stats join both run over data bounded by the time
    range, not the event volume — at 100 TB the post-agg table is the
    same ~10^4 rows it is here. Stats come from exact integer sums
    (no float accumulation order); the stats side is broadcast."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(F.count("*").alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
    )
    z = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "z", F.expr(_Z_SCORE)
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("z")).desc_nulls_last(), F.col("b")
    )
    return (
        z.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ANOM_TOPK)
        .select(
            "event_type",
            fmt_ts(F.col("b"), micros=False).alias("bucket"),
            "c",
            "z",
        )
        .orderBy("event_type", "bucket")
    )


# --------------------------------------------------------------------------
# Chunk-level duplicate detection: which fixed-size token windows recur
# across documents (Lee et al. 2022's substring dedup at window
# granularity — the pass that catches shared boilerplate/quotations
# exact-doc and near-doc dedup both miss). Reuses doc_chunking's
# geometry and fingerprints; only FULL windows participate (standard
# practice — short tail windows match trivially).
# --------------------------------------------------------------------------

_CHUNK_DEDUP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
starts AS (
  SELECT doc_id, toks,
         UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks), 1), {_CHUNK_STRIDE}))
           AS start_tok
  FROM t
),
chunks AS (
  SELECT doc_id,
         LEAST({_CHUNK_TOKENS}, LEN(toks) - start_tok + 1) AS n_tok,
         MD5(ARRAY_TO_STRING(toks[start_tok:start_tok + {_CHUNK_TOKENS} - 1], ' '))
           AS chunk_md5
  FROM starts
)
SELECT chunk_md5,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS keeper_doc
FROM chunks
WHERE n_tok = {_CHUNK_TOKENS}
GROUP BY chunk_md5
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY chunk_md5
"""


@plan("chunk_dedup_groups", oracle=_CHUNK_DEDUP_ORACLE)
def chunk_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate chunks: full {chunk}-token windows whose
    fingerprint occurs in >= 2 distinct documents, with the lowest
    doc_id as the canonical keeper — the window-granular substring
    dedup that catches shared boilerplate inside otherwise-distinct
    documents. One chunking scan (array expressions + explode, no
    Python) into one hash-partitioned aggregate on the uniform md5 key;
    at 100 TB this is the same single shuffle the exact-dedup pass
    runs, at chunk cardinality."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    chunks = t.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("toks"), F.lit(1)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start_tok"),
        "toks",
    ).select(
        "doc_id",
        F.least(
            F.lit(_CHUNK_TOKENS), F.size("toks") - F.col("start_tok") + 1
        ).alias("n_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("start_tok"), F.lit(_CHUNK_TOKENS)))
        ).alias("chunk_md5"),
    )
    return (
        chunks.filter(F.col("n_tok") == _CHUNK_TOKENS)
        .groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_md5")
    )
