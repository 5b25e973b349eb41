"""Training-data pipeline plans: text retrieval — BM25 ranking,
tf-idf keyword extraction, and the positional-postings query family
(phrase / boolean / proximity / k-term phrase), each with prepared-
index and live (base ∪ pending) twins.

Parity discipline: every parity-sensitive scalar formula is ONE shared
SQL-syntax string passed to Spark via ``F.expr`` and to DuckDB
verbatim, so both engines parse the identical expression tree; rounded
doubles aggregate through the exact decimal accumulator
(:func:`venus_spark.functions.dsum`).

(Moved verbatim from the accreted pipeline_ops6 module in the r14
domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import davg, dsum, tokens, dround, lit_doubles
from venus_spark.functions.sqlgen import (
    davg_sql,
    dround_sql,
    dsum_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# BM25 top-k retrieval
# --------------------------------------------------------------------------

_BM25_TERMS = ("vector", "stream", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

# The per-(doc, term) partial score. ONE string, parsed by both engines:
# inputs are tf/dl/df/n_docs (BIGINT) and avgdl (canonical double), so the
# arithmetic promotes identically and LN/div/mul associate identically.
# Rounded to 6 dp so the per-doc sum can use the exact decimal accumulator.
_BM25_RAW = (
    f"LN((n_docs - df + 0.5) / (df + 0.5) + CAST(1 AS DOUBLE))"
    f" * (tf * ({_BM25_K1} + CAST(1 AS DOUBLE)))"
    f" / (tf + {_BM25_K1} * (CAST(1 AS DOUBLE) - {_BM25_B} + {_BM25_B} * dl / avgdl))"
)
_BM25_TERM_SCORE = dround_sql(_BM25_RAW)

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS toks,
         LEN({tokens_sql('LOWER(text)')}) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, {davg_sql('dl')} AS avgdl FROM dl
),
hits AS (
  SELECT doc_id, dl,
         UNNEST(LIST_FILTER(toks, x -> LIST_CONTAINS([{_BM25_TERMS_SQL}], x))) AS term
  FROM dl
),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM hits GROUP BY doc_id, dl, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, {_BM25_TERM_SCORE} AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id, {dround_sql(f'''{dsum_sql('s')}''')} AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}
"""


@plan("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval, top-k documents for a fixed term set.

    Scale shape: tokens are filtered to query-term hits BEFORE the
    explode, so the exploded row count is proportional to matching
    postings, not corpus tokens; corpus stats (N, avgdl) and per-term
    document frequencies are broadcast-sized; the only data-sized
    shuffle keys on doc_id for hit documents; top-k is
    TakeOrderedAndProject. The pg_trgm-style text access path of the
    reference (`/root/reference/README.rst:101`) generalized to ranked
    retrieval.
    """
    # Packed-tokens ckpt tried and REJECTED too (r16, REPEAT=3
    # interleaved: 1.80 s -> 2.45 s), on top of r15's rejected ckpt on
    # the exploded tf stream — the scheduler overlaps the stats/tf
    # re-tokenizations on idle slots, so any barrier serializes more
    # than it saves at this geometry.
    dl = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        tokens(F.lower(F.col("text"))).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("dl"))

    stats = dl.agg(
        F.count("*").alias("n_docs"), davg("dl").alias("avgdl")
    )

    # explode + IN-filter, not a higher-order array filter: the generate
    # and the codegen'd IN run vectorized, where a filter() lambda is
    # interpreted per token AND pays a large one-shot expression-compile
    # cost (measured ~4.5 s at sf0.1 — same lesson as the shingle zip
    # rewrite, PERF.md).
    hits = dl.select(
        "doc_id",
        "dl",
        F.explode("toks").alias("term"),
    ).filter(F.col("term").isin(*_BM25_TERMS))
    # Lineage-cut on tf tried and REJECTED (r15): the re-run of the
    # tokenize pass under the broadcast-df build costs less than the
    # checkpoint barrier on this shape (1.12x slower, REPEAT=3).
    tf = hits.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select("doc_id", F.expr(_BM25_TERM_SCORE).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(dround(dsum("s")).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


def _bm25_from_index(
    post: DataFrame, dfreq: DataFrame, stats: DataFrame
) -> DataFrame:
    """The index-served BM25 pipeline — ONE copy shared by the prepared
    and live variants (and the same scoring string as the from-corpus
    plan), so the three plans cannot silently diverge from their shared
    oracle: pushed In(term) posting fetch, broadcast df/stats joins,
    per-doc decimal score sum, TakeOrderedAndProject top-k."""
    hits = post.filter(F.col("term").isin(*_BM25_TERMS))
    scored = (
        hits.join(
            F.broadcast(dfreq.filter(F.col("term").isin(*_BM25_TERMS))), "term"
        )
        .join(F.broadcast(stats))
        .select("doc_id", F.expr(_BM25_TERM_SCORE).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(dround(dsum("s")).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


@plan("bm25_topk_prepared", oracle=_BM25_ORACLE)
def bm25_topk_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_topk served from the prepared inverted index
    (prepared.documents_postings): the query-term filter pushes into
    the term-sorted postings scan (``PushedFilters: In(term, ...)``,
    row-group pruning — the posting-list fetch), df and corpus stats
    come from materialized broadcast-sized tables, and the only
    remaining work is the per-doc score sum + top-k. No tokenize, no
    explode, no stats aggregation at query time — the Lucene/GIN
    steady-state. Same oracle: the layout changes the access path, not
    the answer."""
    from venus_spark.prepared import documents_postings

    return _bm25_from_index(*documents_postings(spark, sf_dir))


@plan("bm25_topk_live", oracle=_BM25_ORACLE)
def bm25_topk_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_topk served from the LIVE inverted index
    (``prepared.documents_postings_live``): base postings ∪ any
    not-yet-merged streaming micro-batches, df recomputed over the
    union, stats from the stored counters plus every batch's
    per-document counter rows — the GIN pending-list scan posture
    (PostgreSQL reads tree + fastupdate pending on every query; the
    VACUUM-style ``merge_postings_pending`` restores the pure pushed-
    filter path). Over a quiescent corpus (the driver's case) the union
    is empty and the answer — same oracle — certifies that the live
    read path degrades to exactly the prepared one; the streaming tests
    certify the with-pending half of the contract."""
    from venus_spark.prepared import documents_postings_live

    return _bm25_from_index(*documents_postings_live(spark, sf_dir))


# --------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# --------------------------------------------------------------------------

_TFIDF_TOP_PER_DOC = 3
_TFIDF_DOC_LIMIT = 20  # report keywords for doc_id < this bound

# Smoothed idf; tf BIGINT, df/n_docs BIGINT -> identical double promotion.
_TFIDF_SCORE = f"{dround_sql('tf * LN((n_docs + CAST(1 AS DOUBLE)) / (df + CAST(1 AS DOUBLE)))')}"

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({tokens_sql('LOWER(text)')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
stats AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
),
scored AS (
  SELECT tf.doc_id, tf.term, {_TFIDF_SCORE} AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank
FROM ranked
WHERE rank <= {_TFIDF_TOP_PER_DOC} AND doc_id < {_TFIDF_DOC_LIMIT}
"""


@plan("tfidf_keywords", oracle=_TFIDF_ORACLE)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tf-idf keywords per document (document fingerprinting for
    corpus exploration / topic labeling).

    Scale shape: the (doc, term) frequency table is the one data-sized
    shuffle (keyed on doc_id then term — both high-cardinality and
    uniform); document frequencies aggregate to vocabulary size and
    broadcast back; the per-doc ranking window partitions by doc_id, so
    no global ordering anywhere. Corpus-wide df is computed BEFORE the
    reporting filter, as it must be.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    # Lineage-cut on tf tried and REJECTED (r15): three re-derivations
    # of the tokenize+agg still beat the checkpoint's materialize+read
    # barrier here (1.06x slower, REPEAT=3).
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = tf.agg(F.countDistinct("doc_id").alias("n_docs"))

    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select("doc_id", "term", F.expr(_TFIDF_SCORE).alias("tfidf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(
            (F.col("rank") <= _TFIDF_TOP_PER_DOC)
            & (F.col("doc_id") < _TFIDF_DOC_LIMIT)
        )
    )


@plan("tfidf_keywords_prepared", oracle=_TFIDF_ORACLE)
def tfidf_keywords_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tfidf_keywords served from the prepared inverted index: tf rows
    come straight off the postings table (no tokenize/explode at query
    time), df from the materialized vocabulary table, and — because df
    is already corpus-wide — the reporting filter (doc_id < bound)
    pushes into the scan BEFORE scoring, so only the reported docs'
    postings are ever scored or ranked. n_docs is recomputed as
    COUNT(DISTINCT doc_id) over postings to match the oracle exactly
    (a zero-token document is absent from postings but counted by the
    corpus stats table). Same oracle as tfidf_keywords."""
    from pyspark.sql import Window

    from venus_spark.prepared import documents_postings

    post, dfreq, _stats = documents_postings(spark, sf_dir)
    stats = post.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        post.filter(F.col("doc_id") < _TFIDF_DOC_LIMIT)
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select("doc_id", "term", F.expr(_TFIDF_SCORE).alias("tfidf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_TOP_PER_DOC)
    )




# --------------------------------------------------------------------------
# Phrase search over the positional inverted index
# --------------------------------------------------------------------------

_PHRASE = ("part", "filter")  # adjacent-token phrase present at every SF

_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS t FROM documents
),
hits AS (
  SELECT doc_id,
         LEN(LIST_FILTER(RANGE(1, LEN(t)),
             i -> t[i] = '{_PHRASE[0]}' AND t[i + 1] = '{_PHRASE[1]}'))
           AS n_occurrences
  FROM toks
)
SELECT doc_id, n_occurrences FROM hits WHERE n_occurrences > 0
ORDER BY doc_id
"""


def _term_pair_positions(post: DataFrame, t1: str, t2: str) -> DataFrame:
    """(doc_id, pos1, pos2) for documents containing BOTH terms —
    the shared scaffolding of the positional queries (phrase,
    proximity): pushed In(term) posting fetch, per-term position
    lists, doc_id join. One copy so the fetch path cannot fork, and
    parameterized by the postings relation so the PREPARED (base) and
    LIVE (base ∪ pending) read paths serve the identical algebra."""
    hits = post.filter(F.col("term").isin(t1, t2))
    p1 = hits.filter(F.col("term") == t1).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = hits.filter(F.col("term") == t2).select(
        "doc_id", F.col("pos").alias("pos2")
    )
    return p1.join(p2, "doc_id")


@plan("phrase_search_prepared", oracle=_PHRASE_ORACLE)
def phrase_search_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query served from the POSITIONAL inverted index:
    fetch the two terms' postings (query terms as a pushed parquet
    filter over the term-sorted layout — the posting-list fetch), join
    them on doc_id, and count adjacency by intersecting one term's
    position list shifted by +1 with the other's — the classic
    Lucene/IR phrase-intersection algorithm. The corpus text is never
    touched and nothing is tokenized at query time; per-document work
    is O(|pos1| + |pos2|), proportional to the PHRASE terms' postings,
    not to document length. The oracle recomputes occurrences from raw
    token adjacency, certifying the positional index end-to-end.
    Generalizes to k-term phrases by chaining the same shifted
    intersection."""
    from venus_spark.prepared import documents_postings

    post, _dfreq, _stats = documents_postings(spark, sf_dir)
    return (
        _term_pair_positions(post, *_PHRASE)
        .select(
            "doc_id",
            F.size(
                F.array_intersect(
                    F.transform("pos1", lambda x: x + 1), F.col("pos2")
                )
            ).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Boolean retrieval over the inverted index (AND / NOT posting algebra)
# --------------------------------------------------------------------------

_BOOL_MUST = ("vector", "merge")  # both required ...
_BOOL_NOT = "stream"  # ... and this term excluded

_BOOL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS t FROM documents
)
SELECT doc_id FROM toks
WHERE LIST_CONTAINS(t, '{_BOOL_MUST[0]}')
  AND LIST_CONTAINS(t, '{_BOOL_MUST[1]}')
  AND NOT LIST_CONTAINS(t, '{_BOOL_NOT}')
ORDER BY doc_id
"""


@plan("boolean_search_prepared", oracle=_BOOL_ORACLE)
def boolean_search_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval (t1 AND t2 AND NOT t3) as posting-list
    algebra over the inverted index: one pushed-filter fetch of the
    three terms' postings, AND = doc_id join between the required
    terms' lists, NOT = left-anti join against the excluded term's
    list. The classic Boolean IR evaluation — work is proportional to
    the QUERY terms' posting lists, never the corpus, and every join
    keys on the uniform doc_id. The oracle recomputes membership from
    raw tokens, certifying the index's completeness in both directions
    (a missing posting loses an AND doc; a phantom posting loses a NOT
    doc)."""
    from venus_spark.prepared import documents_postings

    post, _dfreq, _stats = documents_postings(spark, sf_dir)
    return _bool_from_postings(post)


def _bool_from_postings(post: DataFrame) -> DataFrame:
    """The AND/NOT posting algebra over a postings relation — shared by
    the prepared and live plans."""
    fetched = post.filter(
        F.col("term").isin(*_BOOL_MUST, _BOOL_NOT)
    ).select("term", "doc_id")

    def plist(t: str):
        return fetched.filter(F.col("term") == t).select("doc_id")

    return (
        plist(_BOOL_MUST[0])
        .join(plist(_BOOL_MUST[1]), "doc_id")
        .join(plist(_BOOL_NOT), "doc_id", "left_anti")
        .orderBy("doc_id")
    )


@plan("boolean_search_live", oracle=_BOOL_ORACLE)
def boolean_search_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval over the LIVE postings view — with the live
    twins for BM25, k-term phrase, and proximity this completes the
    set: every retrieval mode the inverted index serves is also served
    from base ∪ pending, so a streaming deployment never trades query
    capability for freshness. NOT semantics are exact on the union: a
    streamed document containing the excluded term is anti-joined out
    the moment its batch commits. Degrades to the prepared plan on a
    quiescent corpus under the same raw-token oracle."""
    from venus_spark.prepared import documents_postings_live

    post, _dfreq, _stats = documents_postings_live(spark, sf_dir)
    return _bool_from_postings(post)


# --------------------------------------------------------------------------
# Proximity (slop) search over the positional index
# --------------------------------------------------------------------------

_PROX_TERMS = ("hash", "join")
_PROX_SLOP = 3  # max token distance between the two terms

_PROX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS t FROM documents
),
h AS (
  SELECT doc_id,
         [i FOR i IN RANGE(1, LEN(t) + 1) IF t[i] = '{_PROX_TERMS[0]}'] AS p1,
         [i FOR i IN RANGE(1, LEN(t) + 1) IF t[i] = '{_PROX_TERMS[1]}'] AS p2
  FROM toks
),
n AS (
  SELECT doc_id,
         LEN(LIST_FILTER(FLATTEN([[ABS(a - b) FOR b IN p2] FOR a IN p1]),
             d -> d <= {_PROX_SLOP})) AS n_near
  FROM h
)
SELECT doc_id, n_near FROM n WHERE n_near > 0 ORDER BY doc_id
"""


@plan("proximity_search_prepared", oracle=_PROX_ORACLE)
def proximity_search_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (slop) query: documents where the two terms occur
    within 3 tokens of each other, with the count of such position
    pairs — phrase search's tolerant sibling (Lucene's ``"a b"~k``),
    served from the SAME positional postings: pushed In(term) fetch,
    doc_id join, |pos1 − pos2| <= slop over the two position lists.
    Per-document work is O(|pos1|·|pos2|) over the QUERY terms'
    occurrences (single digits per doc), text never read, nothing
    tokenized. Oracle recomputes from raw token positions; position
    BASES differ (0- vs 1-based) but distances are base-invariant."""
    from venus_spark.prepared import documents_postings

    post, _dfreq, _stats = documents_postings(spark, sf_dir)
    return _prox_from_postings(post)


def _prox_from_postings(post: DataFrame) -> DataFrame:
    """The proximity algebra over a postings relation — shared by the
    prepared and live plans so the slop evaluation cannot fork."""
    n_near = F.size(
        F.filter(
            F.flatten(
                F.transform(
                    "pos1",
                    lambda a: F.transform(F.col("pos2"), lambda b: F.abs(a - b)),
                )
            ),
            lambda d: d <= F.lit(_PROX_SLOP),
        )
    )
    return (
        _term_pair_positions(post, *_PROX_TERMS)
        .select("doc_id", n_near.alias("n_near"))
        .filter(F.col("n_near") > 0)
        .orderBy("doc_id")
    )


@plan("proximity_search_live", oracle=_PROX_ORACLE)
def proximity_search_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same proximity query over the LIVE postings view (base ∪
    not-yet-merged streaming batches) — certifying that positional
    queries served from the streaming read path degrade to the
    prepared one on a quiescent corpus, exactly as ``bm25_topk_live``
    does for ranked retrieval; the with-pending half (a streamed
    document matching the slop window pre-merge) is covered by the
    full-topology streaming test."""
    from venus_spark.prepared import documents_postings_live

    post, _dfreq, _stats = documents_postings_live(spark, sf_dir)
    return _prox_from_postings(post)


# --------------------------------------------------------------------------
# k-term phrase search: chained position intersection
# --------------------------------------------------------------------------

_KPHRASE = ("big", "order", "scan")  # 3-token phrase present at every SF

_KPHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('LOWER(text)')} AS t FROM documents
),
hits AS (
  SELECT doc_id,
         LEN(LIST_FILTER(RANGE(1, LEN(t) - 1),
             i -> t[i] = '{_KPHRASE[0]}' AND t[i + 1] = '{_KPHRASE[1]}'
                  AND t[i + 2] = '{_KPHRASE[2]}'))
           AS n_occurrences
  FROM toks
)
SELECT doc_id, n_occurrences FROM hits WHERE n_occurrences > 0
ORDER BY doc_id
"""


@plan("phrase_search_kterm", oracle=_KPHRASE_ORACLE)
def phrase_search_kterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-term exact phrase over the positional inverted index — the
    chained generalization ``phrase_search_prepared``'s docstring
    promises: one pushed In(term) fetch of ALL k terms' postings, then
    k−1 doc_id joins each narrowing the candidate START positions
    ``P ← P ∩ (pos_i − i)`` (an array_intersect of two position lists).
    A document leaves the pipeline at the first term it lacks — the
    standard Lucene ConjunctionDISI shape — and per-document work stays
    proportional to the QUERY terms' occurrence counts. The corpus text
    is never read and nothing is tokenized at query time; the oracle
    recomputes occurrences from raw token adjacency, certifying
    position correctness across all three offsets."""
    from venus_spark.prepared import documents_postings

    post, _dfreq, _stats = documents_postings(spark, sf_dir)
    return _kphrase_from_postings(post)


def _kphrase_from_postings(
    post: DataFrame, phrase: tuple[str, ...] = _KPHRASE
) -> DataFrame:
    """The chained k-term position intersection over a postings
    relation — shared by the prepared and live plans (and the
    streaming tests, which query a streamed phrase through it)."""
    fetched = post.filter(F.col("term").isin(*phrase)).select(
        "term", "doc_id", "pos"
    )

    def plist(i: int) -> DataFrame:
        # positions of term i re-based to the phrase START position
        return fetched.filter(F.col("term") == phrase[i]).select(
            "doc_id",
            F.transform("pos", lambda x: x - i).alias(f"p{i}"),
        )

    cand = plist(0).withColumnRenamed("p0", "starts")
    for i in range(1, len(phrase)):
        cand = cand.join(plist(i), "doc_id").select(
            "doc_id",
            F.array_intersect("starts", f"p{i}").alias("starts"),
        )
    return (
        cand.select("doc_id", F.size("starts").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
        .orderBy("doc_id")
    )


@plan("phrase_search_kterm_live", oracle=_KPHRASE_ORACLE)
def phrase_search_kterm_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-term phrase over the LIVE postings view (base ∪
    not-yet-merged streaming batches) — the streaming read path of
    positional retrieval, degrading to the prepared plan on a
    quiescent corpus under the same raw-token oracle; a streamed
    document whose phrase must surface pre-merge is asserted in the
    full-topology streaming test."""
    from venus_spark.prepared import documents_postings_live

    post, _dfreq, _stats = documents_postings_live(spark, sf_dir)
    return _kphrase_from_postings(post)


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
    from venus_spark.plans.pipeline_retrieval import _BM25_ORACLE

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
    query = lit_doubles(qrow["embedding"])
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
    from venus_spark.plans.pipeline_retrieval import bm25_topk

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
    from venus_spark.plans.pipeline_retrieval import bm25_topk_prepared

    return _rrf_fused(spark, sf_dir, bm25_topk_prepared(spark, sf_dir))


