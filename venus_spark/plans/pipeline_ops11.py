"""Training-data pipeline plans, part 11: hybrid retrieval (RRF),
incremental dedup of a new batch against the stored corpus index,
entity-resolution pairing via deletion-neighborhood blocking, per-group
linear trend with exact-parity sums, and train/serve distribution-drift
auditing.

Same discipline as parts 1-10: built-in column expressions only (no
Python in the data path), every parity-sensitive scalar formula is ONE
shared SQL string handed to Spark via ``F.expr`` and to DuckDB verbatim,
and aggregation of rounded doubles goes through the exact decimal
accumulator (:func:`venus_spark.functions.dsum`) so summation order can
never matter.

Reference tie-in: the reference serves its query surface through
documented SQL over PostgreSQL (`/root/reference/README.rst:82-107`);
these plans extend that surface with the retrieval/curation operators a
training-data engine adds on top, each carrying its ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum, dround
from venus_spark.functions.sqlgen import (
    davg_sql,
    dround_sql,
    dsum_sql,
    hashed_shingles_sql,
    shingles_sql,
    token_hash31_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine top-k
# --------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
_RRF_SIDE_K = 20  # depth of each retrieval list entering the fusion
_RRF_TOPK = 10
_RRF_QUERY_VEC_ID = 0

# One shared scoring string: ranks are BIGINT, 1.0/(k+r) is the same
# double division in both engines, and the two-list sum is a two-term
# add — no accumulation-order concerns.
_RRF_RAW = (
    f"COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + r_lex), 0.0)"
    f" + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + r_vec), 0.0)"
)
_RRF_SCORE = dround_sql(_RRF_RAW)

_VD = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"


def _rank_bounded(df: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """1-based dense ranking of a LIMIT-k result (score desc, doc_id
    asc tiebreak) as a bounded-array aggregate instead of a window:
    the input is k rows by construction, so collect_list is a k-element
    array and the sort/posexplode are constant work — the ROW_NUMBER()
    twin of the oracle without a WindowExec in the physical plan."""
    arr = df.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(score_col)).alias("neg_score"),
                    F.col("doc_id").alias("doc_id"),
                )
            )
        ).alias("a")
    )
    return arr.select(F.posexplode("a").alias("pos", "x")).select(
        F.col("x.doc_id").alias("doc_id"),
        (F.col("pos") + 1).alias(rank_name),
    )


def _rrf_oracle() -> str:
    from venus_spark.functions.sqlgen import cosine_sql
    from venus_spark.plans.pipeline_ops6 import _BM25_ORACLE

    return f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
  FROM ({_BM25_ORACLE})
),
vec AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, doc_id) AS r_vec
  FROM (
    WITH q AS (
      SELECT {_VD.format('embedding')} AS qv
      FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC_ID}
    )
    SELECT e.vec_id AS doc_id,
           {dround_sql(f'''{cosine_sql(_VD.format('e.embedding'), 'q.qv')}''')} AS cosine_sim
    FROM embeddings e CROSS JOIN q
    ORDER BY cosine_sim DESC, doc_id LIMIT {_RRF_SIDE_K}
  )
),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         {_RRF_SCORE} AS rrf
  FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
"""


def _rrf_fused(spark: SparkSession, sf_dir: str, lex: DataFrame) -> DataFrame:
    """The fusion stage shared by both hybrid plans (one copy, so the
    fused semantics cannot fork): dense cosine top-k for the fixed
    query vector, bounded-aggregate ranks over both k-row lists (no
    WindowExec — see _rank_bounded), full outer join on doc_id, RRF
    score, final top-k."""
    from venus_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == _RRF_QUERY_VEC_ID)
        .select("embedding")
        .first()
    )  # bounded single-row fetch, same idiom as sim_cosine_topk
    query = F.array(*[F.lit(float(x)).cast("double") for x in qrow["embedding"]])
    vec = brute_force_topk(emb, query, k=_RRF_SIDE_K).withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = _rank_bounded(lex, "bm25", "r_lex").join(
        _rank_bounded(vec, "cosine_sim", "r_vec"), "doc_id", "full"
    ).select("doc_id", F.expr(_RRF_SCORE).alias("rrf"))
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(_RRF_TOPK)


@plan("hybrid_search_rrf", oracle=_rrf_oracle())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: fuse the BM25 lexical top-k and the dense cosine
    top-k by reciprocal-rank fusion (score = Σ 1/(60+rank)) — the
    standard RAG retrieval composition, built entirely from plans this
    engine already serves (bm25_topk's postings-proportional scan and
    the brute-force cosine baseline; swap in the prepared-postings /
    IVF-pruned variants for the 100 TB path, the fusion is unchanged).

    Scale shape: both retrieval lists are corpus-sized scans reduced to
    k rows by TakeOrderedAndProject; everything after — the rank
    windows, the full outer join on doc_id, the final top-k — runs on
    at most 2k = 40 rows regardless of corpus size, so the rank
    windows over LIMIT-k inputs are constant-bounded by construction
    (NOT data-sized single-partition windows; the corpus never flows
    through them)."""
    from venus_spark.plans.pipeline_ops6 import bm25_topk

    return _rrf_fused(spark, sf_dir, bm25_topk(spark, sf_dir))


@plan("hybrid_search_rrf_prepared", oracle=_rrf_oracle())
def hybrid_search_rrf_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hybrid_search_rrf served from the prepared layouts: the lexical
    list comes from the materialized inverted index (bm25_topk_prepared
    — the query terms arrive as a pushed parquet filter on the
    term-sorted postings, no tokenize/explode at query time) while the
    dense list stays the exact cosine scan so the fused answer — and
    the oracle — are identical. At 100 TB the dense side swaps to the
    IVF-partition-pruned probe (sim_ivf_topk_prepared) for a fully
    index-served hybrid; the fusion stage is unchanged either way."""
    from venus_spark.plans.pipeline_ops6 import bm25_topk_prepared

    return _rrf_fused(spark, sf_dir, bm25_topk_prepared(spark, sf_dir))


# --------------------------------------------------------------------------
# Incremental dedup: a new batch screened against the EXISTING corpus
# through the stored MinHash index (the production ingest-time path)
# --------------------------------------------------------------------------

_INC_MOD = 3  # doc_id % 3 == 0 plays the "newly arrived batch"
_INC_T = 0.8  # same near-dup threshold as dedup_minhash_lsh


def _incremental_oracle() -> str:
    from venus_spark.functions import HASH_P31
    from venus_spark.operators import dedup as dd

    sh = shingles_sql("text")
    mins = ",\n         ".join(
        f"MIN(({dd.PERM_A[i]} * h + {dd.PERM_B[i]}) % {HASH_P31}) AS mh_{i}"
        for i in range(dd.N_PERM)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, MD5(CONCAT_WS('-', "
        + ", ".join(
            f"mh_{b * dd.ROWS_PER_BAND + r}" for r in range(dd.ROWS_PER_BAND)
        )
        + ")) AS band_hash FROM sig"
        for b in range(dd.N_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST({sh}) AS tok FROM documents
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
  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS dup_doc
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % {_INC_MOD} = 0 AND b.doc_id % {_INC_MOD} <> 0
),
hsets AS (
  SELECT doc_id, {hashed_shingles_sql('text')} AS t FROM documents
),
verified AS (
  SELECT c.new_doc, c.dup_doc,
         {dround_sql('''LEN(LIST_INTERSECT(x.t, y.t)) * CAST(1 AS DOUBLE) /
               (LEN(x.t) + LEN(y.t) - LEN(LIST_INTERSECT(x.t, y.t)))''')}
           AS jaccard_sim
  FROM cands c
  JOIN hsets x ON c.new_doc = x.doc_id
  JOIN hsets y ON c.dup_doc = y.doc_id
)
SELECT new_doc, dup_doc, jaccard_sim FROM verified
WHERE jaccard_sim > {_INC_T}
"""


@plan("dedup_incremental", oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening: which documents of a NEW batch
    duplicate the EXISTING corpus — the decision an ingest pipeline
    makes per batch, as opposed to the corpus-wide self-dedup of
    dedup_minhash_lsh. Both sides are served from the prepared MinHash
    index (stored signatures + hashed shingle sets, maintained O(batch)
    at INSERT by append_documents / the streaming pending-list): query
    time pays band expressions, the new-vs-old band join, and exact
    Jaccard verification of candidates only. The batch here is the
    doc_id % 3 == 0 slice standing in for newly arrived documents.

    Scale shape: candidate generation is a hash join keyed on
    (band_idx, band_hash) where only the BATCH side is new work — the
    corpus side reads stored bands; no a<b self-join over the corpus,
    no corpus-wide signature recompute, verification touches candidate
    pairs only. This is exactly how the funnel stays O(batch) per
    ingest cycle at 100 TB."""
    from venus_spark.operators.dedup import incremental_near_dups
    from venus_spark.prepared import documents_minhash

    idx = documents_minhash(spark, sf_dir)
    is_new = (F.col("doc_id") % _INC_MOD) == 0
    return incremental_near_dups(
        idx.filter(is_new), idx.filter(~is_new), threshold=_INC_T
    )


# --------------------------------------------------------------------------
# Entity resolution: single-substitution identifier pairs via
# deletion-neighborhood (wildcard-mask) blocking
# --------------------------------------------------------------------------

_ER_DIGITS = 9  # c_name = 'Customer#' + 9 digits (TPC-H spec format)
_ER_PREFIX_LEN = 9  # len('Customer#')

# One shared mask string: wildcard position p of the digit tail. SUBSTR
# is 1-based with identical semantics in Spark SQL and DuckDB.
_ER_MASK = (
    f"CONCAT(SUBSTR(c_name, 1, {_ER_PREFIX_LEN} + p - 1), '?', "
    f"SUBSTR(c_name, {_ER_PREFIX_LEN} + p + 1))"
)

_ER_ORACLE = f"""
WITH named AS (
  SELECT c_custkey, c_name FROM customer
  WHERE REGEXP_MATCHES(c_name, '^Customer#[0-9]{{{_ER_DIGITS}}}$')
),
m AS (
  SELECT c_custkey, c_name, p, {_ER_MASK} AS mask
  FROM named CROSS JOIN (
    SELECT UNNEST(GENERATE_SERIES(1, {_ER_DIGITS})) AS p
  )
)
SELECT a.p AS pos, COUNT(*) AS n_pairs
FROM m a JOIN m b ON a.mask = b.mask AND a.c_custkey < b.c_custkey
WHERE LEVENSHTEIN(a.c_name, b.c_name) = 1
GROUP BY a.p ORDER BY pos
"""


@plan("er_hamming_pairs", oracle=_ER_ORACLE)
def er_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairing: customer identifiers within
    Hamming distance 1, found by deletion-neighborhood blocking — each
    name emits L variants with one position wildcarded, names agreeing
    on a variant differ in at most that position, and an edit-distance
    check verifies each candidate (the classic blocking→verify ER
    shape; the mask join is LSH for strings).

    Scale shape: the expansion is O(L·N) rows (L = 9, a constant), the
    self-join hashes on the mask key whose groups are bounded by the
    alphabet (≤ 10 names can share one wildcard mask), and verification
    touches candidates only — never the quadratic all-pairs. The verify
    itself exploits the blocking invariant: mask equality already
    proves the names agree at every non-wildcard position, so distance
    exactly 1 reduces to name inequality (an O(L) compare instead of
    the O(L²) levenshtein DP — measured 2.7 s → ~0.1 s over the 262k
    candidates at sf0.1; the oracle keeps the independent LEVENSHTEIN
    formulation, and the brute-force completeness test pins the
    equivalence). Reported as pairs-per-wildcard-position, the blocking
    audit an ER pipeline tracks.

    The equal-length fixed-format filter makes mask blocking EXACT for
    substitution distance; general edit distance ≤ k needs the
    partition-signature generalization (PassJoin) on the same plan
    shape."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .filter(F.col("c_name").rlike(f"^Customer#[0-9]{{{_ER_DIGITS}}}$"))
    )
    m = cust.select(
        "c_custkey",
        "c_name",
        F.explode(F.array(*[F.lit(p) for p in range(1, _ER_DIGITS + 1)])).alias("p"),
    ).select("c_custkey", "c_name", "p", F.expr(_ER_MASK).alias("mask"))
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.mask") == F.col("b.mask"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).filter(F.col("a.c_name") != F.col("b.c_name"))
    return (
        pairs.groupBy(F.col("a.p").alias("pos"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("pos")
    )


# --------------------------------------------------------------------------
# Per-group linear trend (exact-parity ordinary least squares)
# --------------------------------------------------------------------------

# Day zero of the event window; integer microseconds so the centering
# subtraction below is exact BIGINT arithmetic in both engines.
_TREND_T0_US = 1704067200000000  # 2024-01-01 00:00:00 UTC
_US_PER_DAY = "86400000000.0"

# Shared per-row centered terms: x_us0/xbar_us/y/ybar are all either
# BIGINT or canonical doubles, so the arithmetic is bit-deterministic;
# ROUND(...,6) makes each term exactly representable for dsum.
_TREND_XC = f"((CAST(x_us0 AS DOUBLE) - xbar_us) / {_US_PER_DAY})"
_TREND_YC = "(y - ybar)"
_TREND_T_XY = f"{dround_sql(f'{_TREND_XC} * {_TREND_YC}')}"
_TREND_T_XX = f"{dround_sql(f'{_TREND_XC} * {_TREND_XC}')}"
_TREND_T_YY = f"{dround_sql(f'{_TREND_YC} * {_TREND_YC}')}"

# Final projections over the exact aggregates (sxy/sxx/syy canonical
# doubles from dsum; xbar_us/ybar canonical from davg).
_TREND_SLOPE = f"CASE WHEN sxx > 0 THEN {dround_sql('sxy / sxx')} END"
_TREND_INTERCEPT = (
    f"CASE WHEN sxx > 0 THEN "
    f"{dround_sql(f'ybar - (sxy / sxx) * (xbar_us / {_US_PER_DAY})')} END"
)
_TREND_R2 = (
    f"CASE WHEN sxx * syy > 0 THEN {dround_sql('(sxy * sxy) / (sxx * syy)')} END"
)

_TREND_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         EPOCH_US(ts) - {_TREND_T0_US} AS x_us0,
         {dround_sql('value')} AS y
  FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         {davg_sql('x_us0')} AS xbar_us,
         {davg_sql('y')} AS ybar
  FROM ev GROUP BY event_type
),
terms AS (
  SELECT ev.event_type,
         {_TREND_T_XY} AS t_xy,
         {_TREND_T_XX} AS t_xx,
         {_TREND_T_YY} AS t_yy
  FROM ev JOIN stats USING (event_type)
),
agg AS (
  SELECT event_type,
         {dsum_sql('t_xy')} AS sxy,
         {dsum_sql('t_xx')} AS sxx,
         {dsum_sql('t_yy')} AS syy
  FROM terms GROUP BY event_type
)
SELECT s.event_type, s.n,
       {_TREND_SLOPE} AS slope_per_day,
       {_TREND_INTERCEPT} AS intercept,
       {_TREND_R2} AS r2
FROM agg a JOIN stats s USING (event_type)
ORDER BY s.event_type
"""


@plan("value_trend_per_type", oracle=_TREND_ORACLE)
def value_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of value over time (OLS slope,
    intercept at the window origin, R²) — the drift/trend tile of any
    metrics dashboard, computed under the repo's exact-parity
    discipline: timestamps center as exact BIGINT microseconds, the
    centered per-row terms are rounded then summed through the decimal
    accumulator (summation order cannot matter), and the closing
    slope/R² divisions are single deterministic double ops. The same
    numbers as SQL's REGR_SLOPE/REGR_R2 family, which both engines
    implement over order-dependent double sums and therefore cannot be
    value-hashed across engines.

    Scale shape: two corpus scans (the mean pass and the term pass),
    both partial-aggregating on event_type; the stats join is a
    broadcast of one row per group. At 100 TB the second scan reuses
    the first's shuffle partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(_TREND_T0_US)
        ).alias("x_us0"),
        dround("value").alias("y"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        davg("x_us0").alias("xbar_us"),
        davg("y").alias("ybar"),
    )
    terms = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.expr(_TREND_T_XY).alias("t_xy"),
        F.expr(_TREND_T_XX).alias("t_xx"),
        F.expr(_TREND_T_YY).alias("t_yy"),
    )
    agg = terms.groupBy("event_type").agg(
        dsum("t_xy").alias("sxy"),
        dsum("t_xx").alias("sxx"),
        dsum("t_yy").alias("syy"),
    )
    return (
        agg.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "n",
            F.expr(_TREND_SLOPE).alias("slope_per_day"),
            F.expr(_TREND_INTERCEPT).alias("intercept"),
            F.expr(_TREND_R2).alias("r2"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Distribution drift: total-variation distance between two periods
# --------------------------------------------------------------------------

_DRIFT_CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC (window midpoint)
_DRIFT_BIN_W = "25.0"

# Integer-exact TV distance: TV = Σ|c_a·n_b − c_b·n_a| / (2·n_a·n_b).
# Every input is a BIGINT count, so the numerator sum is exact and the
# single closing division is deterministic in both engines.
# Guarded: a type present in only ONE period has n_a*n_b = 0 and the
# raw ratio degenerates to 0/0 = NaN (engine-divergent under hashing).
# TV against an empty distribution is definitionally 1 when the other
# side is non-empty (total mass moved), NULL when both are empty.
_DRIFT_TV = (
    "CASE WHEN n_a > 0 AND n_b > 0 THEN "
    f"{dround_sql('CAST(num AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE)')} "
    "WHEN n_a > 0 OR n_b > 0 THEN CAST(1 AS DOUBLE) END"
)

_DRIFT_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(value / {_DRIFT_BIN_W}) AS INTEGER) AS bin,
         (EPOCH_US(ts) < {_DRIFT_CUT_US}) AS in_a
  FROM events
),
bins AS (
  SELECT event_type, bin,
         SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS c_a,
         SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS c_b
  FROM ev GROUP BY event_type, bin
),
totals AS (
  SELECT event_type,
         CAST(SUM(c_a) AS BIGINT) AS n_a,
         CAST(SUM(c_b) AS BIGINT) AS n_b,
         COUNT(*) AS n_bins
  FROM bins GROUP BY event_type
),
num AS (
  SELECT b.event_type,
         SUM(ABS(b.c_a * t.n_b - b.c_b * t.n_a)) AS num
  FROM bins b JOIN totals t USING (event_type)
  GROUP BY b.event_type
)
SELECT t.event_type, t.n_a, t.n_b, t.n_bins, {_DRIFT_TV} AS tv_drift
FROM num JOIN totals t USING (event_type)
ORDER BY t.event_type
"""


@plan("distribution_drift_tv", oracle=_DRIFT_ORACLE)
def distribution_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per event type: total-variation distance
    between the value histogram of the window's first half and its
    second half — the train/serve (or week-over-week corpus) drift
    audit of a data pipeline, preferred here over PSI/KL because TV
    needs no logarithm: with exact integer bin counts the statistic is
    a ratio of integers, bit-equal across engines, where log-based
    divergences differ in the last ulp between libm implementations.

    Scale shape: one scan → partial-aggregating (type, bin) counts
    (bins are constant-width, so cardinality is bounded), then
    constant-size joins of per-type totals. Histogram counts are the
    mergeable partial — the same statistic serves streaming
    micro-batches by summing bin counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / F.expr(_DRIFT_BIN_W)).cast("integer").alias("bin"),
        (
            F.unix_micros(F.col("ts").cast("timestamp")) < F.lit(_DRIFT_CUT_US)
        ).alias("in_a"),
    )
    bins = ev.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("c_b"),
    )
    totals = bins.groupBy("event_type").agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count("*").alias("n_bins"),
    )
    num = (
        bins.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
            ).alias("num")
        )
    )
    return (
        num.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "n_a",
            "n_b",
            "n_bins",
            F.expr(_DRIFT_TV).alias("tv_drift"),
        )
        .orderBy("event_type")
    )
