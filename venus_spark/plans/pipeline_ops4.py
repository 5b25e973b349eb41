"""Training-data pipeline plans, part 4: duplicate-cluster resolution,
repetition-based quality signals, corpus health reporting, and length
distribution — the curation stages that consume the dedup/quality
primitives from parts 1-3.

Same discipline as parts 1-3: Spark side is built-in column expressions
or well-bounded iterative joins; every oracle is generated from the same
constants as the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, shingles, tokens, dround
from venus_spark.functions.sqlgen import davg_sql, dround_sql, shingles_sql, tokens_sql
from venus_spark.operators import text as tx
from venus_spark.plans.pipeline_ops import _minhash_oracle
from venus_spark.plans.pipeline_ops3 import (
    _MAX_STOP_RATIO,
    _MIN_TOKENS,
    _MIN_TTR,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_TOKS = tokens_sql("text")

# --------------------------------------------------------------------------
# Duplicate-cluster resolution: near-dup PAIRS -> connected components ->
# one cluster id per document. The reference's dedup story stops at "find
# duplicates"; a pipeline must also decide which copy to KEEP, and that
# requires resolving the pair graph into clusters (A~B, B~C => {A,B,C}
# even when A~C was never emitted by LSH).
# --------------------------------------------------------------------------

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_oracle()})
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
labels AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
SELECT l.id AS doc_id, l.cluster_id, s.n_members,
       (l.id = l.cluster_id) AS is_keeper
FROM labels l
JOIN (SELECT cluster_id, COUNT(*) AS n_members FROM labels GROUP BY cluster_id) s
  USING (cluster_id)
ORDER BY doc_id
"""


@plan("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs resolved into duplicate clusters by
    iterative min-label propagation (operators.dedup.connected_components),
    with the min doc_id as the canonical keeper. The oracle computes the
    same components via a recursive CTE. The iteration count is bounded by
    the pair-graph diameter — small by construction for near-dup graphs —
    and each round is one shuffle join over the (tiny relative to corpus)
    edge set, never over the documents themselves. Pairs come from the
    prepared ingest-time signature index (same result as the recompute
    path — the oracle recomputes from scratch and still hash-matches)."""
    from venus_spark.operators.dedup import connected_components, lsh_near_dup_pairs_from_index
    from venus_spark.plans.pipeline_ops import _JACCARD_T
    from venus_spark.prepared import documents_minhash

    pairs = lsh_near_dup_pairs_from_index(
        documents_minhash(spark, sf_dir), threshold=_JACCARD_T
    )
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    return (
        labels.join(sizes, "cluster_id")
        .select(
            F.col("id").alias("doc_id"),
            "cluster_id",
            "n_members",
            (F.col("id") == F.col("cluster_id")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# The shipped corpus: documents minus every non-keeper cluster member —
# what the dedup stack exists to produce. Anti-join against the (tiny)
# drop list; the corpus itself is scanned exactly once.
# --------------------------------------------------------------------------

_KEEP_ORACLE = f"""
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN (
  {_CLUSTERS_ORACLE}
) c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.is_keeper
ORDER BY d.doc_id
"""


@plan("dedup_keep_corpus", oracle=_KEEP_ORACLE)
def dedup_keep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus a training run actually reads: every
    document except non-keeper near-dup cluster members (min doc_id per
    cluster is kept). The drop list is orders of magnitude smaller than
    the corpus but still corpus-proportional, so the anti-join is left
    to AQE — broadcast while the list fits, shuffle on the uniform
    doc_id when (at 100 TB) it no longer does; all heavy lifting
    happened in the LSH/cluster stages over the pair graph."""
    from venus_spark.operators.dedup import connected_components, lsh_near_dup_pairs_from_index
    from venus_spark.plans.pipeline_ops import _JACCARD_T
    from venus_spark.prepared import documents_minhash

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_near_dup_pairs_from_index(
        documents_minhash(spark, sf_dir), threshold=_JACCARD_T
    )
    labels = connected_components(pairs)
    drop = labels.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
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
    docs = load_table(spark, sf_dir, "documents")
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
# Vocabulary rarity: mean inverse-document-frequency RATIO per document.
# The idf family without logarithms on purpose: ln/log10 are not
# correctly-rounded in every libm, so a last-ulp difference between the
# JVM and DuckDB could flip the value hash; n_docs/df uses only IEEE
# division (correctly rounded), keeping the parity discipline.
# --------------------------------------------------------------------------

_RARITY_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, UNNEST({_TOKS}) AS tok FROM documents
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
tot AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, {davg_sql('n_docs * CAST(1 AS DOUBLE) / df')} AS mean_idf_ratio
FROM toks JOIN dfreq USING (tok) CROSS JOIN tot
GROUP BY doc_id
ORDER BY doc_id
"""


@plan("vocab_rarity", oracle=_RARITY_ORACLE)
def vocab_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vocabulary rarity: the mean, over a doc's distinct
    tokens, of n_docs/document_frequency — high values flag documents
    built from vocabulary the rest of the corpus doesn't use (OOV-ish /
    spam / wrong-language leakage). Shapes: one explode, one
    partially-aggregated groupBy for the df table, one shuffle join back
    on the token key (zipf-head tokens are the skew risk — AQE skew-join
    is on; at 100 TB, broadcast the df head and default the tail), one
    per-doc aggregate. The corpus size joins in as a broadcast one-row
    aggregate, not a driver constant."""
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.count("*").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    return (
        toks.join(dfreq, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(davg(F.col("n_docs") * F.lit(1).cast("double") / F.col("df")).alias("mean_idf_ratio"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# N-gram novelty: the share of a document's distinct word-3-grams that
# occur in NO other document — the complement of boilerplate: near-1.0
# means original phrasing, near-0.0 means the doc is assembled from
# corpus-common n-grams.
# --------------------------------------------------------------------------

_SH = shingles_sql("text")

_NOVELTY_ORACLE = f"""
WITH g AS (
  SELECT doc_id, UNNEST({_SH}) AS gram FROM documents
),
gf AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
SELECT g.doc_id,
       {dround_sql('SUM(CASE WHEN gf.df = 1 THEN 1 ELSE 0 END) * CAST(1 AS DOUBLE) / COUNT(*)')}
         AS novel_3gram_share
FROM g JOIN gf USING (gram)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


@plan("ngram_novelty", oracle=_NOVELTY_ORACLE)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each doc's distinct word-3-grams that are corpus-unique
    (document frequency 1). Same explode/agg/join-back shape as
    vocab_rarity, on the shingle key — shingles are phrase-level, so the
    df table has no zipf head to speak of (a hot shingle IS duplication,
    which the dedup stack removes first)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", F.explode(shingles("text")).alias("gram"))
    gf = g.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        g.join(gf, "gram")
        .groupBy("doc_id")
        .agg(
            dround(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                * F.lit(1).cast("double")
                / F.count("*")
            ).alias("novel_3gram_share")
        )
        .orderBy("doc_id")
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
# The full curation funnel in one plan: quality gate AND not a near-dup
# cluster drop AND not benchmark-contaminated — the query that produces
# the training set. Each stage reuses the exact constants of its
# standalone plan, so this composition cannot drift from the parts.
# --------------------------------------------------------------------------

def _curated_oracle() -> str:
    from venus_spark.plans.pipeline_ops3 import _BENCH_MAX_ID, _DECON_N

    decon_sh = shingles_sql("text", _DECON_N)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_oracle()})
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
dup_drop AS (
  SELECT id FROM (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
  WHERE id <> cluster_id
),
bench AS (
  SELECT DISTINCT UNNEST({decon_sh}) AS g
  FROM documents WHERE doc_id < {_BENCH_MAX_ID}
),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, UNNEST({decon_sh}) AS g
        FROM documents WHERE doc_id >= {_BENCH_MAX_ID}) c
  JOIN bench USING (g)
)
SELECT doc_id, lang, source
FROM documents
WHERE doc_id >= {_BENCH_MAX_ID}
  AND {_PASS_SQL}
  AND doc_id NOT IN (SELECT id FROM dup_drop)
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY doc_id
"""


@plan("curated_corpus", oracle=_curated_oracle())
def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training set: corpus documents (the benchmark split excluded)
    that pass the quality gate, are not near-dup cluster drops, and
    share no {n}-gram with the benchmark set. One corpus scan carries
    the quality predicate; the two exclusion lists are orders of
    magnitude smaller than the corpus but corpus-proportional, so
    their anti-joins are left to AQE (broadcast while small, shuffle
    on the uniform doc_id at scale) — the funnel shape a production
    curation run has, with every stage's constants imported from its
    standalone plan."""
    from venus_spark.prepared import documents_minhash

    return curated_funnel(
        load_table(spark, sf_dir, "documents"),
        documents_minhash(spark, sf_dir),
    )


def curated_funnel(
    docs: DataFrame, mh: DataFrame, bench_docs: DataFrame | None = None
) -> DataFrame:
    """The curation funnel over INJECTED relations — shared by the
    ``curated_corpus`` plan (current tables) and the snapshot-pinned
    export (:func:`venus_spark.export.export_curated_jsonl` with a
    recorded file-set snapshot), so the two can never drift. ``docs``
    is the RAW documents relation (neither caller delete-filters it —
    the funnel's output is anti-joined against tombstones by the
    caller that needs RTBF, e.g. the export); ``mh`` is the MinHash
    index relation, delete-filtered by its provider. ``bench_docs``
    overrides where the decontamination BENCHMARK set is extracted
    from (default: ``docs`` itself) — the delta export passes the full
    table here while ``docs`` is only the newly-landed files, since
    the bench set is a corpus-level constant that a delta slice
    usually does not contain."""
    from venus_spark.operators.dedup import (
        connected_components,
        lsh_near_dup_pairs_from_index,
    )
    from venus_spark.plans.pipeline_ops import _JACCARD_T
    from venus_spark.plans.pipeline_ops3 import _BENCH_MAX_ID, _DECON_N

    corpus = docs.filter(F.col("doc_id") >= _BENCH_MAX_ID)

    labels = connected_components(
        lsh_near_dup_pairs_from_index(mh, threshold=_JACCARD_T)
    )
    dup_drop = labels.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )

    bench_grams = (
        (docs if bench_docs is None else bench_docs)
        .filter(F.col("doc_id") < _BENCH_MAX_ID)
        .select(F.explode(shingles("text", _DECON_N)).alias("g"))
        .distinct()
    )
    contaminated = (
        corpus.select("doc_id", F.explode(shingles("text", _DECON_N)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )

    gated = tx.quality_features(corpus).filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("type_token_ratio") >= _MIN_TTR)
        & (F.col("stopword_ratio") <= _MAX_STOP_RATIO)
    )
    return (
        gated.join(dup_drop, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )
