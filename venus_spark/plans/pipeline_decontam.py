"""Training-data pipeline plans: benchmark decontamination and
cross-source overlap — the train/test-leak scrubs every LLM corpus
runs before training.

(Moved verbatim from the accreted pipeline_ops3/9/12 modules in the
r14 domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import dround, shingles, token_hash31, tokens
from venus_spark.lineage import ckpt
from venus_spark.functions.sqlgen import (
    dround_sql,
    hashed_shingles_sql,
    shingles_sql,
    token_hash31_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_HASHED_SHINGLES = hashed_shingles_sql("text")

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
    docs = load_table(spark, sf_dir, "documents", fanned=True)
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
    # vocab feeds THREE consumers (sizes + both self-join sides); the
    # lazy lineage cut makes the explode+distinct run once instead of
    # three times (r15 — the before-explain shows three Scan+Generate+
    # Exchange evaluations of the same subtree).
    vocab = ckpt(
        idx.select("source", F.explode("_sh_h").alias("h")).distinct()
    )
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
# Winnowing fingerprints (MOSS): windowed-minimum k-gram digests
# --------------------------------------------------------------------------

_WIN_K = 4  # token k-gram size
_WIN_W = 5  # winnowing window (consecutive k-gram hashes)


def winnow_sel_sql(src: str = "documents") -> str:
    """The winnowing digest as ONE SQL fragment — subquery producing
    ``(doc_id, n_grams, fps)`` over ``src``. Shared by the digest
    oracle, the pairs oracle, and the generative cross-engine fuzz
    mirror (tests/test_generative_parity.py), so a change to the gram
    construction or window rule cannot silently fork any of them."""
    k, w = _WIN_K, _WIN_W
    grams = (
        f"[ARRAY_TO_STRING(t[i:i+{k - 1}], ' ') "
        f"FOR i IN RANGE(1, LEN(t) - {k - 2})]"
    )
    h = f"LIST_TRANSFORM({grams}, g -> {token_hash31_sql('g')})"
    return f"""(
  WITH w_toks AS (
    SELECT doc_id, {tokens_sql('LOWER(text)')} AS t FROM {src}
  ),
  w_hashed AS (
    SELECT doc_id, {h} AS h FROM w_toks
  ),
  w_wins AS (
    SELECT doc_id, h,
           GREATEST(LEN(h) - {w - 1},
                    CASE WHEN LEN(h) > 0 THEN 1 ELSE 0 END) AS n_win
    FROM w_hashed
  )
  SELECT doc_id, LEN(h) AS n_grams,
         LIST_DISTINCT([LIST_MIN(h[j:j+{w - 1}])
                        FOR j IN RANGE(1, n_win + 1)]) AS fps
  FROM w_wins
)"""


def _win_oracle() -> str:
    return f"""
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(LEN(fps) AS BIGINT) AS n_selected,
       COALESCE(CAST(LIST_SUM(fps) AS BIGINT), 0) AS fp_checksum
FROM {winnow_sel_sql()} sel ORDER BY doc_id
"""


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, fps) — the winnowing kernel: ordered token
    k-gram hashes, per-window minima, distinct selected values. ONE
    definition shared by the plan and the guarantee test, so the
    property the test certifies is the production derivation."""
    k, w = _WIN_K, _WIN_W
    t = tokens(F.lower(F.col("text")))
    docs = docs.select("doc_id", t.alias("t"))
    cnt = F.size("t") - (k - 1)
    grams = F.slice("t", 1, cnt)
    for i in range(2, k + 1):
        grams = F.zip_with(
            grams, F.slice("t", i, cnt), lambda a, b: F.concat_ws(" ", a, b)
        )
    hashed = docs.select(
        "doc_id",
        F.when(F.size("t") >= k, F.transform(grams, token_hash31))
        .otherwise(F.array().cast("array<bigint>"))
        .alias("h"),
    )
    n_win = F.greatest(
        F.size("h") - (w - 1), F.when(F.size("h") > 0, 1).otherwise(0)
    )
    return hashed.select(
        "doc_id",
        F.size("h").cast("long").alias("n_grams"),
        F.when(
            F.size("h") > 0,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda j: F.array_min(F.slice("h", j, w)),
                )
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("fps"),
    )


@plan("winnowing_fingerprints", oracle=_win_oracle())
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing digest per document: hash the ORDERED token
    k-gram sequence, slide a w-window over the hash sequence, select
    each window's minimum, and keep the distinct selected values — the
    local-fingerprinting scheme that catches PARTIAL overlap (a copied
    paragraph inside an otherwise-novel document) where the global
    MinHash signature dilutes it. Guarantee: any shared substring of at
    least w+k-1 tokens shares at least one selected fingerprint. A
    document shorter than w windows contributes its overall minimum;
    the emitted columns are the count digest + exact integer checksum
    of the selected set, so any selection divergence — window
    off-by-one, tie handling, hash drift — flips the hash-checked
    checksum. At scale the fingerprint set (not the checksum) is the
    join key for candidate pairing, exactly like the LSH band join;
    work is one narrow scan, all array ops per-row in codegen."""
    sel = winnow_fingerprints(load_table(spark, sf_dir, "documents", fanned=True))
    return sel.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_selected"),
        F.aggregate("fps", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fp_checksum"
        ),
    ).orderBy("doc_id")


_WIN_MAX_DF = 50  # fingerprints in more docs than this are "stopword" prints
_WIN_MIN_SHARED = 2


def _win_pairs_oracle() -> str:
    return f"""
WITH fpd AS (
  SELECT doc_id, UNNEST(fps) AS fp FROM {winnow_sel_sql()} sel
),
rare AS (
  SELECT fp FROM fpd GROUP BY fp HAVING COUNT(*) <= {_WIN_MAX_DF}
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fpd a JOIN rare USING (fp) JOIN fpd b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= {_WIN_MIN_SHARED}
ORDER BY id_a, id_b
"""


@plan("winnowing_pairs", oracle=_win_pairs_oracle())
def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level near-dup CANDIDATE PAIRS from the winnowing digests:
    documents sharing at least 2 selected fingerprints, with the shared
    count — the MOSS pairing step, and the local-overlap sibling of the
    MinHash LSH band join (LSH catches whole-document similarity; a
    shared winnowing fingerprint pins a shared ≥ w+k−1-token RUN, so an
    excerpt embedded in an otherwise-novel document still pairs).

    Scale shape: identical to the band join — explode per-doc
    fingerprints, drop "stopword" prints appearing in more than 50
    documents (ubiquitous boilerplate would quadratically blow the
    bucket; standard winnowing practice, and exactly the bounded-bucket
    discipline the LSH plans document), then a fingerprint-keyed
    self-join whose bucket sizes are bounded by that cap, then a
    pair-keyed count. No all-pairs expansion anywhere; every join keys
    on a hash-uniform value. The per-document fingerprint arrays are
    materialized BEFORE the explode (localCheckpoint — corpus-
    fingerprint-sized, tiny next to the text): Generate re-evaluates
    its child expression per EMITTED row, so exploding the raw
    windowed-minimum expression re-ran the whole kernel once per
    fingerprint (measured 122 s → ~1.6 s at sf0.1); the checkpoint also
    keeps the df filter and both join sides from recomputing it."""
    fpd = ckpt(
        winnow_fingerprints(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "fps")
    ).select("doc_id", F.explode("fps").alias("fp"))
    rare = (
        fpd.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _WIN_MAX_DF)
        .select("fp")
    )
    pruned = fpd.join(rare, "fp")
    a = pruned.select("fp", F.col("doc_id").alias("id_a"))
    b = pruned.select("fp", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
        .orderBy("id_a", "id_b")
    )


