"""Training-data pipeline plans: evaluation and monitoring metrics —
embedding outliers, and (from the later waves) retrieval MRR/nDCG and
distribution-drift total variation.

(Moved verbatim from the accreted pipeline_ops9/11/12 modules in the
r14 domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum, l2sq, tokens, dround
from venus_spark.functions.sqlgen import (
    davg_sql,
    dround_sql,
    dsum_sql,
    l2sq_sql,
    tokens_sql,
)
from venus_spark.plans.pipeline_retrieval import _BM25_TERM_SCORE
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_VDBL = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"

# --------------------------------------------------------------------------
# Embedding outliers: farthest-from-centroid triage per cluster.
# --------------------------------------------------------------------------

_OUTLIER_N = 3

_OUTLIER_ORACLE = f"""
WITH long_cent AS (
  SELECT label AS cluster,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS pos,
         UNNEST({_VDBL.format('embedding')}) AS v
  FROM embeddings
),
cent AS (
  SELECT cluster, pos, {davg_sql('v')} AS centroid_v
  FROM long_cent GROUP BY cluster, pos
),
cent_arr AS (
  SELECT cluster, LIST(centroid_v ORDER BY pos) AS centroid
  FROM cent GROUP BY cluster
),
e AS (
  SELECT vec_id, label, {_VDBL.format('embedding')} AS v FROM embeddings
),
d AS (
  SELECT e.vec_id, e.label,
         {dround_sql(f'''{l2sq_sql('e.v', 'c.centroid')}''')} AS centroid_l2sq
  FROM e JOIN cent_arr c ON c.cluster = e.label
)
SELECT vec_id, label, centroid_l2sq, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY centroid_l2sq DESC, vec_id) AS rn
  FROM d
) WHERE rn <= {_OUTLIER_N}
"""


@plan("embedding_outliers", oracle=_OUTLIER_ORACLE)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N farthest vectors from their own cluster centroid — the
    mislabel/outlier triage view of the embedding space (the farthest
    members are the first candidates for relabeling or pruning, the
    complement of dedup_semantic_keep's nearest-pair view). Centroids
    are the shared position-wise decimal mean (operators.similarity.
    centroid_arrays — n_clusters rows, broadcast); the distance is one
    codegen L2² fold per row, and WindowGroupLimit keeps only N rows
    per cluster on the map side. One scan, one broadcast, one tiny
    window — the same shape at any corpus size."""
    from venus_spark.operators.similarity import as_double, centroid_arrays

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroid_arrays(emb)
    d = (
        emb.select(
            "vec_id", "label", as_double(F.col("embedding")).alias("v")
        )
        .join(F.broadcast(cents), F.col("label") == F.col("cluster"))
        .select(
            "vec_id",
            "label",
            dround(l2sq(F.col("v"), F.col("centroid"))).alias(
                "centroid_l2sq"
            ),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("centroid_l2sq").desc(), F.col("vec_id")
    )
    return d.select(
        "vec_id", "label", "centroid_l2sq", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _OUTLIER_N)




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
    # bins feeds totals AND the |c_a·n_b − c_b·n_a| sum; the lazy
    # checkpoint cuts the second full events scan (r15).
    from venus_spark.lineage import ckpt

    bins = ckpt(bins)
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


# --------------------------------------------------------------------------
# Retrieval evaluation: MRR / recall@k of BM25 against boolean ground truth
# --------------------------------------------------------------------------

_EVAL_QUERIES = ((1, ("vector", "stream")), (2, ("hash", "join")), (3, ("big", "order")))
_EVAL_K = 10

_EVAL_TERMS = sorted({t for _, ts in _EVAL_QUERIES for t in ts})
_EVAL_TERMS_SQL = ", ".join(f"'{t}'" for t in _EVAL_TERMS)
_EVAL_QTERMS_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, ts in _EVAL_QUERIES for t in ts
)

# The per-(doc, term) partial is _BM25_TERM_SCORE — the SAME string the
# BM25 plans use, so the eval grades exactly the scorer they ship.
# CAST(1 AS DOUBLE), not the bare literal 1.0: Spark parses 1.0 as
# DECIMAL and divides exactly while DuckDB divides doubles — the exact
# literal class PARITY.md bans from hash-checked columns.
_RR_SQL = f"{dround_sql('CAST(1 AS DOUBLE) / first_rel_rank')}"  # NULL rank -> NULL rr
_RECALL_SQL = (
    "CASE WHEN n_relevant = 0 THEN NULL ELSE "
    f"{dround_sql('CAST(rel_at_k AS DOUBLE) / CAST(n_relevant AS DOUBLE)')} END"
)

# The qterms→perdoc grading prefix — ONE copy shared by the MRR and
# NDCG oracles, so the two eval plans cannot diverge on their common
# ground truth (BM25 per (query, doc) + matched-term count).
_EVAL_PERDOC_CTES = f"""qterms(query_id, term) AS (VALUES {_EVAL_QTERMS_SQL}),
dl AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS toks,
         LEN({tokens_sql('LOWER(text)')}) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         {dround_sql('CAST(SUM(dl) AS DOUBLE) / COUNT(*)')} AS avgdl
  FROM dl
),
hits AS (
  SELECT doc_id, dl,
         UNNEST(LIST_FILTER(toks, x -> LIST_CONTAINS([{_EVAL_TERMS_SQL}], x)))
           AS term
  FROM dl
),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM hits GROUP BY doc_id, dl, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT qterms.query_id, tf.doc_id, {_BM25_TERM_SCORE} AS s
  FROM tf
  JOIN qterms USING (term)
  JOIN dfreq ON tf.term = dfreq.term
  CROSS JOIN stats
),
perdoc AS (
  SELECT query_id, doc_id,
         {dround_sql(f'''{dsum_sql('s')}''')} AS bm25,
         COUNT(*) AS matched
  FROM scored GROUP BY query_id, doc_id
)"""


def _eval_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, bm25, matched) from the prepared index — the
    Spark twin of _EVAL_PERDOC_CTES, shared by both eval plans."""
    from venus_spark.prepared import documents_postings

    # VALUES LocalRelation, not createDataFrame: parallelized Python
    # rows plan as `Scan ExistingRDD (applySchemaToPythonRDD)`, which
    # launches a Python worker to deserialize 6 literal rows EVERY
    # execution (guide §4: eliminate the Python boundary). The VALUES
    # form is a JVM-side LocalRelation — same rows, same schema, zero
    # Python at execution time.
    # '' -> ' escaping (ADVICE r15): _EVAL_QUERIES is plain words today,
    # but an apostrophe in a future term must not break (or inject into)
    # the statement.
    qterms = spark.sql(
        "SELECT query_id, term FROM VALUES "
        + ", ".join(
            f"({qid}, '{t.replace(chr(39), chr(39) * 2)}')"
            for qid, ts in _EVAL_QUERIES
            for t in ts
        )
        + " AS t(query_id, term)"
    )
    post, dfreq, stats = documents_postings(spark, sf_dir)
    hits = post.filter(F.col("term").isin(*_EVAL_TERMS))
    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.filter(F.col("term").isin(*_EVAL_TERMS))), "term")
        .join(F.broadcast(stats))
        .select("query_id", "doc_id", F.expr(_BM25_TERM_SCORE).alias("s"))
    )
    return scored.groupBy("query_id", "doc_id").agg(
        dround(dsum("s")).alias("bm25"), F.count("*").alias("matched")
    )


_RETRIEVAL_EVAL_ORACLE = f"""
WITH {_EVAL_PERDOC_CTES},
nq AS (
  SELECT query_id, COUNT(*) AS n_terms FROM qterms GROUP BY query_id
),
ranked AS (
  SELECT perdoc.*, nq.n_terms,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY bm25 DESC, doc_id
         ) AS rnk
  FROM perdoc JOIN nq USING (query_id)
),
agg AS (
  SELECT query_id,
         ANY_VALUE(n_terms) AS n_terms,
         SUM(CASE WHEN matched = n_terms THEN 1 ELSE 0 END) AS n_relevant,
         MIN(CASE WHEN matched = n_terms THEN rnk END) AS first_rel_rank,
         SUM(CASE WHEN matched = n_terms AND rnk <= {_EVAL_K} THEN 1 ELSE 0
             END) AS rel_at_k
  FROM ranked GROUP BY query_id
)
SELECT query_id, CAST(n_terms AS BIGINT) AS n_terms,
       CAST(n_relevant AS BIGINT) AS n_relevant,
       CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
       {_RR_SQL} AS rr, {_RECALL_SQL} AS recall_at_k
FROM agg ORDER BY query_id
"""


@plan("retrieval_eval_mrr", oracle=_RETRIEVAL_EVAL_ORACLE)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness: per query, rank the corpus
    by BM25 (served from the prepared inverted index) and grade the
    ranking against a deterministic pseudo-relevance ground truth —
    "relevant" = contains EVERY query term (the boolean-AND set) —
    reporting reciprocal rank of the first relevant document and
    recall@10. This is the eval loop a retrieval pipeline runs on
    every index or scorer change; the oracle recomputes BOTH the
    ranking and the ground truth from raw tokens, so a drifting index
    (missing postings, stale df) or a broken tie-break shows up as a
    metric mismatch.

    Scale shape: one pushed In(term) posting fetch covers all queries
    at once (terms ∪ across queries), the per-(query, doc) score sum
    keys on uniform ids, ranking windows partition per query, and the
    final aggregate is queries-sized. Adding queries widens the In
    filter, never adds scans."""
    # LocalRelation for the same reason as qterms in _eval_perdoc.
    nq = spark.sql(
        "SELECT query_id, CAST(n_terms AS BIGINT) AS n_terms FROM VALUES "
        + ", ".join(f"({qid}, {len(ts)})" for qid, ts in _EVAL_QUERIES)
        + " AS t(query_id, n_terms)"
    )
    perdoc = _eval_perdoc(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")
    ranked = perdoc.withColumn("rnk", F.row_number().over(w)).join(
        F.broadcast(nq), "query_id"
    )
    rel = F.col("matched") == F.col("n_terms")
    agg = ranked.groupBy("query_id").agg(
        F.first("n_terms").cast("long").alias("n_terms"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("long").alias("n_relevant"),
        F.min(F.when(rel, F.col("rnk"))).cast("long").alias("first_rel_rank"),
        F.sum(F.when(rel & (F.col("rnk") <= _EVAL_K), 1).otherwise(0))
        .cast("long")
        .alias("rel_at_k"),
    )
    return agg.select(
        "query_id",
        "n_terms",
        "n_relevant",
        "first_rel_rank",
        F.expr(_RR_SQL).alias("rr"),
        F.expr(_RECALL_SQL).alias("recall_at_k"),
    ).orderBy("query_id")


# --------------------------------------------------------------------------
# Retrieval evaluation, graded: NDCG@k with libm-free literal discounts
# --------------------------------------------------------------------------

import math as _math

# 1/log2(rank+1) for rank 1..k as EXACT double literals computed once in
# Python: neither engine ever calls its libm log, so the discount column
# is bit-identical by construction (PARITY.md: engine log is only
# conditionally in the contract; k constants need no log at all).
_NDCG_DISCOUNTS = {
    r: 1.0 / _math.log2(r + 1) for r in range(1, _EVAL_K + 1)
}

from venus_spark.functions.sqlgen import double_lit_sql as _dbl  # noqa: E402

def _ndcg_term(rank_col: str) -> str:
    """Per-rank DCG term for the given rank column: gain (= matched
    term count, graded relevance) × the rank's literal discount,
    rounded to 6 dp so the sum can use the exact decimal accumulator;
    NULL outside the top k (ignored by SUM on both engines)."""
    discount = (
        f"CASE {rank_col} "
        + " ".join(f"WHEN {r} THEN {_dbl(w)}" for r, w in _NDCG_DISCOUNTS.items())
        + " END"
    )
    return (
        f"CASE WHEN {rank_col} <= {_EVAL_K} "
        f"THEN {dround_sql(f'matched * ({discount})')} END"
    )


_NDCG_RATIO = (
    "CASE WHEN idcg = 0 THEN NULL ELSE "
    f"{dround_sql('CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)')} END"
)

_NDCG_ORACLE = f"""
WITH {_EVAL_PERDOC_CTES},
ranked AS (
  SELECT query_id, matched,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY bm25 DESC, doc_id
         ) AS rnk_sys,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY matched DESC, doc_id
         ) AS rnk_ideal
  FROM perdoc
),
agg AS (
  SELECT query_id,
         {dround_sql(f'''{dsum_sql(_ndcg_term('rnk_sys'))}''')} AS dcg,
         {dround_sql(f'''{dsum_sql(_ndcg_term('rnk_ideal'))}''')} AS idcg
  FROM ranked GROUP BY query_id
)
SELECT query_id, dcg, idcg, {_NDCG_RATIO} AS ndcg
FROM agg ORDER BY query_id
"""


@plan("retrieval_eval_ndcg", oracle=_NDCG_ORACLE)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded retrieval evaluation: NDCG@10 of the BM25 ranking with
    matched-term count as graded relevance — the standard metric when
    relevance is not binary (MRR/recall's sibling; a system that puts
     2-term docs above 1-term docs scores higher even when both count
    as "relevant"). The rank discounts 1/log2(rank+1) are inlined as
    EXACT double literals for the k ranks, so neither engine's libm
    log enters the hash-checked contract; per-rank terms round to 6 dp
    and accumulate through the exact decimal sum, with NDCG as one
    closing division.

    Scale shape: same as retrieval_eval_mrr — one pushed In(term)
    fetch serves every query, both the system and the ideal ranking
    windows partition per query, and the output is queries-sized.

    On the driver corpus (31-word vocabulary, ~58-token docs) every
    top-10 slot holds a full-match document, so ndcg legitimately reads
    1.0 — the dcg/idcg columns still carry the discriminating
    hash-checked content (exact decimal sums through the literal
    discounts), and the metric's sub-1.0 half is pinned by an edge test
    on a corpus where BM25 provably mis-orders the grades
    (tests/test_plan_edges.py)."""
    perdoc = _eval_perdoc(spark, sf_dir)
    # Both rank columns ride ONE window exchange (same partition key,
    # two sort specs), and dcg/idcg are two conditional decimal sums in
    # a single aggregation — one postings fetch, no self-join.
    w_sys = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), "doc_id"
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("matched").desc(), "doc_id"
    )
    ranked = perdoc.withColumn(
        "rnk_sys", F.row_number().over(w_sys)
    ).withColumn("rnk_ideal", F.row_number().over(w_ideal))
    return (
        ranked.groupBy("query_id")
        .agg(
            dround(dsum(F.expr(_ndcg_term("rnk_sys")))).alias("dcg"),
            dround(dsum(F.expr(_ndcg_term("rnk_ideal")))).alias("idcg"),
        )
        .select("query_id", "dcg", "idcg", F.expr(_NDCG_RATIO).alias("ndcg"))
        .orderBy("query_id")
    )


