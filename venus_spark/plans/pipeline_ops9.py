"""Training-data pipeline plans, part 9: corpus-audit operators —
containment dedup, cross-source overlap, embedding outlier QA, and EWMA
trend smoothing.

These extend the dedup/QA families with the audit queries a curation
team runs BEFORE committing a mixture: which documents are excerpts of
others (containment, the second resemblance statistic of Broder's
shingling paper, "On the resemblance and containment of documents",
SEQUENCES 1997), how much two sources share verbatim n-grams (the C4 /
"Deduplicating Training Data Makes Language Models Better" style
cross-split audit, Lee et al. 2022), which vectors sit farthest from
their cluster centroid (mislabel / outlier triage), and a smoothed
operational trend over the event stream.

The reference has no corpus surface (SURVEY.md §2C addendum — these are
the pipeline-ops family, graded alongside §2); parity discipline follows
PARITY.md: shared hash31 shingle sets, decimal-accumulated means, and
identical left-fold double kernels on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import davg, fmt_ts, l2sq, dround
from venus_spark.functions.sqlgen import (
    davg_sql,
    double_lit_sql,
    dround_sql,
    fmt_ts_sql,
    hashed_shingles_sql,
    l2sq_sql,
    shingles_sql,
    token_hash31_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_VDBL = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"

# --------------------------------------------------------------------------
# Containment near-dup pairs (asymmetric): excerpts and supersets that
# symmetric Jaccard misses when |B| >> |A|.
# --------------------------------------------------------------------------

_CONTAIN_T = 0.9
_HASHED_SHINGLES = hashed_shingles_sql("text")

_CONTAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, {_HASHED_SHINGLES} AS t
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         {dround_sql('LEN(LIST_INTERSECT(a.t, b.t)) * CAST(1 AS DOUBLE) / LEN(a.t)')}
           AS containment
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
)
SELECT id_a, id_b, containment FROM pairs WHERE containment > {_CONTAIN_T}
"""


@plan("dedup_containment", oracle=_CONTAIN_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs C(A→B) = |A∩B|/|A| > 0.9 within
    (lang, source) buckets, served from the prepared MinHash index's
    stored hashed shingle sets — one index scan, nothing re-tokenized.
    Same inverted-postings join shape as dedup_jaccard_pairs (a pair
    costs one row per SHARED shingle, sets never ship whole), kept
    bidirectional because containment is asymmetric: a paragraph quoted
    inside a book scores ~1.0 here and ~0 on Jaccard. At 100 TB the
    posting key is a uniform 31-bit hash (no skew) and the one-sided
    size prune (C > t forces |B| > t·|A|) drops most cross-size pairs
    before the aggregation."""
    from venus_spark.operators.dedup import containment_pairs_in_buckets
    from venus_spark.prepared import documents_minhash

    return containment_pairs_in_buckets(
        documents_minhash(spark, sf_dir),
        bucket_cols=["lang", "source"],
        threshold=_CONTAIN_T,
        toks_col="_sh_h",
    )


# --------------------------------------------------------------------------
# Cross-source n-gram overlap: the pre-mixture contamination audit.
# --------------------------------------------------------------------------

_OVERLAP_ORACLE = f"""
WITH vocab AS (
  SELECT DISTINCT source, h FROM (
    SELECT source, UNNEST({_HASHED_SHINGLES}) AS h FROM documents
  )
),
sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS shared_ngrams
  FROM vocab a JOIN vocab b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.shared_ngrams,
       {dround_sql('s.shared_ngrams * CAST(1 AS DOUBLE) / (na.n + nb.n - s.shared_ngrams)')}
         AS ngram_jaccard
FROM shared s
JOIN sizes na ON na.source = s.source_a
JOIN sizes nb ON nb.source = s.source_b
"""


@plan("source_overlap_ngrams", oracle=_OVERLAP_ORACLE)
def source_overlap_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap: distinct word-3-gram hashes
    per source, self-joined on the hash to count shared n-grams, plus
    the Jaccard of the two vocabularies — the audit that catches one
    source republishing another before both enter a training mixture
    (Lee et al. 2022's cross-split leakage measure, run source-level).
    Served from the prepared MinHash index's stored hashed shingles.
    Scale shape: the (source, hash) distinct is one hash-partitioned
    agg on a uniform key; the self-join ships only vocabulary rows
    (distinct n-grams, not occurrences), and the source-pair result is
    |sources|² rows — tiny. The sizes side is broadcast."""
    from venus_spark.prepared import documents_minhash

    idx = documents_minhash(spark, sf_dir)
    vocab = idx.select(
        "source", F.explode("_sh_h").alias("h")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_ngrams"))
    )
    na, nb = F.broadcast(sizes.alias("na")), F.broadcast(sizes.alias("nb"))
    jac = F.col("shared_ngrams") / (
        F.col("na.n") + F.col("nb.n") - F.col("shared_ngrams")
    )
    return (
        shared.join(na, F.col("na.source") == F.col("source_a"))
        .join(nb, F.col("nb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "shared_ngrams",
            dround(jac).alias("ngram_jaccard"),
        )
    )


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
# MinHash estimator audit: signature-estimated vs exact Jaccard on the
# LSH candidate set — the index-quality audit (sim_ivfpq_recall's twin
# on the text side).
# --------------------------------------------------------------------------


def _mh_audit_oracle() -> str:
    from venus_spark.functions import HASH_P31
    from venus_spark.operators import dedup as dd

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
    matches = " + ".join(
        f"(CASE WHEN x.mh_{i} = y.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(dd.N_PERM)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST({shingles_sql('text')}) AS tok FROM documents
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
hsets AS (
  SELECT doc_id, {_HASHED_SHINGLES} AS t FROM documents
),
scored AS (
  SELECT c.id_a, c.id_b,
         {dround_sql(f'({matches}) / {double_lit_sql(dd.N_PERM)}')} AS mh_est,
         {dround_sql('''LEN(LIST_INTERSECT(hx.t, hy.t)) * CAST(1 AS DOUBLE) /
               (LEN(hx.t) + LEN(hy.t) - LEN(LIST_INTERSECT(hx.t, hy.t)))''')}
           AS true_jac
  FROM cands c
  JOIN sig x ON c.id_a = x.doc_id
  JOIN sig y ON c.id_b = y.doc_id
  JOIN hsets hx ON c.id_a = hx.doc_id
  JOIN hsets hy ON c.id_b = hy.doc_id
)
SELECT id_a, id_b, mh_est, true_jac,
       {dround_sql('ABS(mh_est - true_jac)')} AS abs_err
FROM scored
"""


@plan("minhash_recall_audit", oracle=_mh_audit_oracle())
def minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit of the MinHash index: for every LSH
    candidate pair, the signature-estimated Jaccard (matching
    components / N_PERM — the unbiased MinHash estimator, Broder 1997)
    against the exact Jaccard of the stored hashed shingle sets, plus
    the absolute error. The write-time-index counterpart of
    sim_ivfpq_recall (which audits PQ the same way on the vector
    side): run it after tuning N_PERM/band geometry to see what the
    estimator actually resolves at the dedup threshold. Everything is
    served from the prepared index — signatures AND shingle sets are
    stored columns — so the audit costs the candidate join plus one
    row of arithmetic per candidate, never a corpus rescan."""
    from venus_spark.operators import dedup as dd
    from venus_spark.operators.dedup import band_candidate_pairs, jaccard, lsh_bands
    from venus_spark.prepared import documents_minhash

    idx = documents_minhash(spark, sf_dir)
    mh_cols = [f"mh_{i}" for i in range(dd.N_PERM)]
    cands = band_candidate_pairs(lsh_bands(idx.select("doc_id", *mh_cols)))
    side = idx.select("doc_id", F.col("_sh_h").alias("t"), *mh_cols)
    x, y = side.alias("x"), side.alias("y")
    matches = sum(
        F.when(F.col(f"x.mh_{i}") == F.col(f"y.mh_{i}"), 1).otherwise(0)
        for i in range(dd.N_PERM)
    )
    est = dround(matches / F.lit(float(dd.N_PERM)))
    true_jac = dround(jaccard(F.col("x.t"), F.col("y.t")))
    return (
        cands.join(x, F.col("id_a") == F.col("x.doc_id"))
        .join(y, F.col("id_b") == F.col("y.doc_id"))
        .select(
            "id_a",
            "id_b",
            est.alias("mh_est"),
            true_jac.alias("true_jac"),
        )
        .withColumn("abs_err", dround(F.abs(F.col("mh_est") - F.col("true_jac"))))
    )


# --------------------------------------------------------------------------
# Feature-hashing text embedder (the hashing trick, Weinberger et al.,
# ICML 2009): deterministic text -> sparse L2-normalized vector.
# --------------------------------------------------------------------------

_HASH_DIM = 64

_EMBED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({{toks}}) AS t FROM documents
),
hashed AS (
  SELECT doc_id, {{h}} AS h FROM toks
),
buckets AS (
  SELECT doc_id, h % {_HASH_DIM} AS bucket,
         SUM(1 - 2 * ((h >> 6) & 1)) AS v
  FROM hashed GROUP BY doc_id, h % {_HASH_DIM}
),
normed AS (
  SELECT doc_id, bucket, v,
         SQRT(SUM(CAST(v AS DOUBLE) * v) OVER (PARTITION BY doc_id))
           AS nrm
  FROM buckets
)
SELECT doc_id, bucket, {dround_sql('CAST(v AS DOUBLE) / nrm')} AS w
FROM normed WHERE v <> 0
"""


def _embed_oracle() -> str:
    from venus_spark.functions.sqlgen import token_hash31_sql, tokens_sql

    return _EMBED_ORACLE.format(toks=tokens_sql("text"), h=token_hash31_sql("t"))


@plan("text_hash_embed", oracle=_embed_oracle())
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing embedder: every token hashes to one of 64
    buckets with a hash-derived ±1 sign, per-bucket signs sum, and the
    vector is L2-normalized — emitted SPARSE as (doc_id, bucket,
    weight) rows, the form a downstream ANN bulk-load or linear model
    actually ingests. This is the vectorizer-shaped plumbing for
    corpora with no model-served embedding column: fully deterministic
    (hash31 is engine-portable; no model weights), one explode + one
    hash-partitioned agg + one per-doc window over <= 64 rows. At
    100 TB the shuffle carries (doc, bucket) partial sums — already
    combined map-side — never token occurrences; dim is a constant
    (vocabulary-free, the point of the hashing trick)."""
    from venus_spark.functions import token_hash31, tokens

    docs = load_table(spark, sf_dir, "documents")
    h = token_hash31(F.col("t"))
    sign = F.lit(1) - F.lit(2) * F.shiftright(h, 6).bitwiseAND(F.lit(1))
    buckets = (
        docs.select("doc_id", F.explode(tokens("text")).alias("t"))
        .select("doc_id", (h % _HASH_DIM).alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("v"))
    )
    nrm = F.sqrt(
        F.sum(F.col("v").cast("double") * F.col("v")).over(
            Window.partitionBy("doc_id")
        )
    )
    return (
        buckets.withColumn("nrm", nrm)
        .filter(F.col("v") != 0)
        .select(
            "doc_id",
            "bucket",
            dround(F.col("v").cast("double") / F.col("nrm")).alias("w"),
        )
    )


# --------------------------------------------------------------------------
# 2-D point-in-time lookup: correlation key AND time window, plain scan
# vs the Z-order clustered layout.
# --------------------------------------------------------------------------

_L2D_KEY = 13
_L2D_T0, _L2D_T1 = "2024-01-10 00:00:00", "2024-01-13 00:00:00"

_L2D_ORACLE = f"""
SELECT event_id, {fmt_ts_sql('ts')} AS ts_str, event_type,
       value AS event_value
FROM events
WHERE user_id = {_L2D_KEY}
  AND ts >= TIMESTAMP '{_L2D_T0}' AND ts < TIMESTAMP '{_L2D_T1}'
"""


def _lookup_2d(ev: DataFrame) -> DataFrame:
    from venus_spark.plans.venus_surface import _ts

    return ev.filter(
        (F.col("user_id") == _L2D_KEY)
        & (F.col("ts") >= _ts(_L2D_T0))
        & (F.col("ts") < _ts(_L2D_T1))
    ).select(
        "event_id",
        fmt_ts("ts").alias("ts_str"),
        "event_type",
        F.col("value").alias("event_value"),
    )


@plan("lookup_2d", oracle=_L2D_ORACLE)
def lookup_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary pattern with its hypertable constraint
    attached: correlation-key probe AND time window (README.rst:73-74;
    the migration's 1-day chunks exist for exactly this shape). Plain
    full scan — the baseline twin of lookup_2d_zorder; both predicates
    are pushed to the parquet reader but an unclustered layout gives
    the row-group stats nothing to prune on."""
    return _lookup_2d(load_table(spark, sf_dir, "events"))


@plan("lookup_2d_zorder", oracle=_L2D_ORACLE)
def lookup_2d_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 2-D probe served from the Z-order clustered layout
    (prepared.events_zorder): every file covers a small rectangle of
    (user_id, hour) space, so the pushed min/max filters prune on BOTH
    dimensions — the multi-dimensional answer where the 1-D layouts
    (events_by_user, events_by_date) each serve only their own
    predicate. tests/test_prepared.py asserts the footer-stats
    prunability of all three layouts against both probe shapes. Same
    rows, same oracle."""
    from venus_spark.prepared import events_zorder

    return _lookup_2d(events_zorder(spark, sf_dir))


# --------------------------------------------------------------------------
# EWMA smoothing of the hourly event series.
# --------------------------------------------------------------------------

_EWMA_A = 0.3

# the ONE (type, hour, avg value) series definition, shared with
# series_correlation (analytics_ext4) in both engines
_HOURLY_SERIES_SQL = f"""SELECT event_type, DATE_TRUNC('hour', ts) AS h, {davg_sql('value')} AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, DATE_TRUNC('hour', ts)"""


def hourly_value_series(ev: DataFrame) -> DataFrame:
    """Hourly per-type value series (non-NULL values, exact decimal
    mean) — the Spark twin of ``_HOURLY_SERIES_SQL``, shared by the
    EWMA and correlation plans so the series definition cannot
    drift between them."""
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(davg("value").alias("v"))
    )


def _ewma_oracle() -> str:
    from venus_spark.functions.sqlgen import ewma_fold_sql

    return f"""
WITH hourly AS (
  {_HOURLY_SERIES_SQL}
),
series AS (
  SELECT event_type, h, v,
         LIST(v) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS arr
  FROM hourly
)
SELECT event_type, {fmt_ts_sql('h', micros=False)} AS hour,
       v AS hourly_avg,
       {dround_sql(f'''{ewma_fold_sql('arr', _EWMA_A)}''')} AS ewma
FROM series
"""


_EWMA_ORACLE = _ewma_oracle()


@plan("ewma_smoothing", oracle=_EWMA_ORACLE)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per event type over the
    hourly series: ewma_i = α·x_i + (1-α)·ewma_{i-1}, seeded with the
    first observation — the smoothed dashboard trend feeding the
    anomaly view (timeseries_anomaly is the z-score twin; M4 is the
    decimator). The recursion is a left fold over the hour-ordered
    prefix (collect_list over a running window), identical
    IEEE-double step order on both engines (seed = first element, per
    DuckDB LIST_REDUCE). Prefix arrays are quadratic in SERIES length,
    which is bounded by the time range (720 buckets here), never by
    corpus size — the same bounded-cardinality posture as gapfill/LOCF;
    row volume collapses to one row per (type, hour) at the partial
    agg before any window runs."""
    from venus_spark.functions import ewma_fold

    hourly = hourly_value_series(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list("v").over(w)
    ewma = ewma_fold(arr, _EWMA_A)
    return hourly.select(
        "event_type",
        fmt_ts(F.col("h"), micros=False).alias("hour"),
        F.col("v").alias("hourly_avg"),
        dround(ewma).alias("ewma"),
    )
