"""Training-data pipeline plans, part 10: corpus statistics and
behavioral composition — collocation mining, per-source near-dup
rates, and session-duration distribution.

Log-free parity discipline: collocation strength is emitted as LIFT
(the PMI ratio without the logarithm) because libm ``log`` may differ
in the last ulp between the JVM and DuckDB's C runtime, while ratios
of exact integer counts divide identically; ranking by lift orders the
same as ranking by PMI (log is monotone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import bigram_pairs, tokens, dround
from venus_spark.functions.sqlgen import (
    bigram_pairs_sql,
    double_lit_sql,
    dround_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Collocation mining: top bigrams by lift (PMI without the log)
# --------------------------------------------------------------------------

_COLL_MIN_N = 5
_COLL_K = 20

_COLL_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST({tokens_sql('text')}) AS tok FROM documents
),
tok_c AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tok_t AS (SELECT COUNT(*) AS t FROM toks),
bigs AS (
  SELECT UNNEST({bigram_pairs_sql('text')}) AS bg FROM documents
),
big_c AS (SELECT bg, COUNT(*) AS np FROM bigs GROUP BY bg),
big_t AS (SELECT COUNT(*) AS b FROM bigs),
scored AS (
  SELECT bg AS bigram, np AS n_pair,
         {dround_sql('''(CAST(np AS DOUBLE) / b) /
               ((CAST(cx.c AS DOUBLE) / t) * (CAST(cy.c AS DOUBLE) / t))''')}
           AS lift
  FROM big_c
  CROSS JOIN big_t CROSS JOIN tok_t
  JOIN tok_c cx ON cx.tok = SPLIT_PART(bg, ' ', 1)
  JOIN tok_c cy ON cy.tok = SPLIT_PART(bg, ' ', 2)
  WHERE np >= {_COLL_MIN_N}
)
SELECT bigram, n_pair, lift FROM scored
ORDER BY lift DESC, bigram LIMIT {_COLL_K}
"""


@plan("collocation_lift", oracle=_COLL_ORACLE)
def collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the corpus' top bigrams by LIFT —
    p(xy) / (p(x)·p(y)), pointwise mutual information without the
    logarithm (log is monotone, so the ranking is PMI's; the ratio of
    exact integer counts divides bit-identically on both engines where
    libm log need not). The phrase-mining pass a tokenizer team runs
    before deciding merge candidates beyond raw pair frequency
    (bpe_pair_counts is the frequency view; this is the
    association-strength view). Shape: two explode+count aggregations
    on uniform hash keys, two 1-row totals broadcast via cross join,
    two vocabulary joins, TakeOrderedAndProject for the top-k — no
    driver-side fetch, everything count-proportional."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    tok_c = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # totals derive from the count tables (sum of counts == row count),
    # not from re-tokenizing the corpus a second time per total
    tok_t = tok_c.agg(F.sum("c").alias("t"))
    bigs = docs.select(F.explode(bigram_pairs("text")).alias("bg"))
    big_c_all = bigs.groupBy("bg").agg(F.count("*").alias("np"))
    big_t = big_c_all.agg(F.sum("np").alias("b"))
    big_c = big_c_all.filter(F.col("np") >= _COLL_MIN_N)
    cx = tok_c.select(F.col("tok").alias("_tx"), F.col("c").alias("cx"))
    cy = tok_c.select(F.col("tok").alias("_ty"), F.col("c").alias("cy"))
    lift = (F.col("np").cast("double") / F.col("b")) / (
        (F.col("cx").cast("double") / F.col("t"))
        * (F.col("cy").cast("double") / F.col("t"))
    )
    return (
        big_c.crossJoin(F.broadcast(big_t))
        .crossJoin(F.broadcast(tok_t))
        .join(cx, F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == F.col("_tx"))
        .join(cy, F.split_part(F.col("bg"), F.lit(" "), F.lit(2)) == F.col("_ty"))
        .select(
            F.col("bg").alias("bigram"),
            F.col("np").alias("n_pair"),
            dround(lift).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "bigram")
        .limit(_COLL_K)
    )


# --------------------------------------------------------------------------
# Near-dup rate per source: the corpus-quality league table
# --------------------------------------------------------------------------

_NDR_T = 0.8


def _ndr_oracle() -> str:
    from venus_spark.functions.sqlgen import hashed_shingles_sql

    return f"""
WITH toks AS (
  SELECT doc_id, lang, source, {hashed_shingles_sql('text')} AS t
  FROM documents
),
pairs AS (
  SELECT a.source AS source, COUNT(*) AS n_pairs
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE {dround_sql('''LEN(LIST_INTERSECT(a.t, b.t)) * CAST(1 AS DOUBLE) /
              (LEN(a.t) + LEN(b.t) - LEN(LIST_INTERSECT(a.t, b.t)))''')}
        > {_NDR_T}
  GROUP BY a.source
),
docs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT d.source, d.n_docs,
       COALESCE(p.n_pairs, 0) AS n_dup_pairs,
       {dround_sql('COALESCE(p.n_pairs, 0) * CAST(1 AS DOUBLE) / d.n_docs')} AS dup_pair_rate
FROM docs d LEFT JOIN pairs p ON p.source = d.source
ORDER BY d.source
"""


@plan("near_dup_rate_by_source", oracle=_ndr_oracle())
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-quality league table: near-dup pair count and
    pairs-per-document rate PER SOURCE — the first chart a curation
    review asks for when deciding which source to down-weight or
    re-crawl (duplication concentrates by origin; Lee et al. 2022
    report per-split rates for the same reason). Pairs come from the
    same exact shingle-Jaccard kernel as dedup_jaccard_pairs, served
    from the prepared MinHash index and aggregated by the pair's
    bucket source; sources with zero pairs appear with rate 0 via the
    left join against the per-source doc counts. The doc-count
    denominator comes from the BASE table, not the index — the index
    inner-joins signatures and so omits token-free documents, which
    must still count as corpus members (a token-free doc can never
    pair, so the numerator is index-safe)."""
    from venus_spark.operators.dedup import jaccard_pairs_in_buckets
    from venus_spark.prepared import documents_minhash

    idx = documents_minhash(spark, sf_dir)
    pairs = jaccard_pairs_in_buckets(
        idx, bucket_cols=["lang", "source"], threshold=_NDR_T, toks_col="_sh_h"
    )
    src_of = idx.select(F.col("doc_id").alias("id_a"), "source")
    per_src = (
        pairs.join(src_of, "id_a")
        .groupBy("source")
        .agg(F.count("*").alias("n_pairs"))
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    rate = F.coalesce(F.col("n_pairs"), F.lit(0)) / F.col("n_docs")
    return (
        docs.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_dup_pairs"),
            dround(rate).alias("dup_pair_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Session duration distribution
# --------------------------------------------------------------------------

_SDP_GAP = 1800

_SDP_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts >= LAG(ts) OVER w + INTERVAL {_SDP_GAP} SECONDS
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
durations AS (
  SELECT (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) / {double_lit_sql(1e6)}
           AS dur_sec
  FROM sess GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_sessions,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.25)')} AS p25,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.50)')} AS p50,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.75)')} AS p75,
       {dround_sql('QUANTILE_CONT(dur_sec, 0.90)')} AS p90
FROM durations
"""


@plan("session_duration_percentiles", oracle=_SDP_ORACLE)
def session_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session lengths: the shared session operator
    (streaming.windows.sessionize_stream — native session_window, the
    same 30-min ≥-gap rule session_window_stats certifies; note
    sessionize_events is a DIFFERENT dashboard with its own 60-min
    strict gap), each session's first-to-last span in seconds, then
    exact interpolated percentiles — the engagement-health tile next
    to DAU/stickiness on any product dashboard. The oracle recomputes
    the sessions through the independent lag+cumsum formulation, so
    this plan re-certifies the operator while measuring durations.
    Sessionization partial-aggregates per user; the percentile runs
    over one row per session (orders of magnitude below event volume);
    at 100 TB the drop-in is approx_percentile, kept exact here for
    the oracle hash (same policy as value_percentiles)."""
    from venus_spark.streaming.windows import sessionize_stream

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize_stream(ev, gap_seconds=_SDP_GAP)
    dur = (
        F.unix_micros(F.col("session_end").cast("timestamp"))
        - F.unix_micros(F.col("session_start").cast("timestamp"))
    ) / F.lit(1e6)
    durations = sessions.select(dur.alias("dur_sec"))
    return durations.agg(
        F.count("*").alias("n_sessions"),
        *[
            dround(F.percentile("dur_sec", F.lit(q))).alias(
                f"p{int(q * 100)}"
            )
            for q in (0.25, 0.50, 0.75, 0.90)
        ],
    )
