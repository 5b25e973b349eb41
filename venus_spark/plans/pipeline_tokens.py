"""Training-data pipeline plans: vocabulary and token statistics —
document-frequency rarity, n-gram novelty, and (from the later waves)
BPE pair counts, OOV coverage, tokenizer fertility, and collocation
lift.

(Moved verbatim from the accreted pipeline_ops4/5/10/12 modules in the
r14 domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import bigram_pairs, davg, shingles, tokens, dround
from venus_spark.functions.sqlgen import (
    bigram_pairs_sql,
    davg_sql,
    dround_sql,
    shingles_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_TOKS = tokens_sql("text")

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
    (document frequency 1). Shingles are phrase-level, so the df table
    has no zipf head to speak of (a hot shingle IS duplication, which
    the dedup stack removes first).

    r15 shape: a corpus-unique gram (df = 1, an OCCURRENCE count)
    belongs to exactly one document, so the old corpus-sized join-back
    (every gram occurrence re-shuffled against the df table, then
    re-shuffled again onto doc_id) is unnecessary: carry min(doc_id)
    through the df aggregate — for a df=1 group that IS the owning doc
    — and the novel count per doc falls out of the (tiny) df=1 slice.
    Per-doc totals come from a doc-keyed partial aggregate of the same
    explode. Two partial-aggregated shuffles of aggregate rows replace
    one full shuffle of every gram occurrence plus its doc_id re-shuffle
    (guide §2.3/§2.4); the closing join is doc-sized on both sides.
    The share arithmetic is the identical double division."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", F.explode(shingles("text")).alias("gram"))
    novel = (
        g.groupBy("gram")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    totals = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            dround(
                F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
                * F.lit(1).cast("double")
                / F.col("n_grams")
            ).alias("novel_3gram_share"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Tokenizer training, step zero: corpus-wide adjacent-pair frequencies
# (the statistic the first BPE merge maximizes). Raw multiplicity, not
# per-doc distinct — a merge cares how often the pair occurs, not in
# how many documents.
# --------------------------------------------------------------------------

_BPE_TOP_K = 20

_BPE_ORACLE = f"""
SELECT g AS pair, COUNT(*) AS n_occurrences
FROM (SELECT UNNEST({bigram_pairs_sql("text")}) AS g FROM documents)
GROUP BY g
ORDER BY n_occurrences DESC, pair
LIMIT {_BPE_TOP_K}
"""


@plan("bpe_pair_counts", oracle=_BPE_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration's candidate table: corpus-wide
    adjacent token-pair occurrence counts, top {_BPE_TOP_K} with a
    deterministic (count DESC, pair) tie-break. One scan, the bigram
    build is two array slices zipped (O(tokens), codegen), then
    explode -> partial-aggregating groupBy -> TakeOrderedAndProject.
    The full merge loop re-runs this statistic per iteration; each
    iteration is this same shuffle-light shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(bigram_pairs("text")).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(_BPE_TOP_K)
    )


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
# Tokenizer vocabulary coverage: OOV rate under a top-V vocabulary
# --------------------------------------------------------------------------

_VOCAB_SIZE = 256  # top-V terms by collection frequency form the vocabulary

# BIGINT/BIGINT promotes to double identically in both engines; one
# shared string so the division cannot fork.
_OOV_RATE = f"{dround_sql('CAST(oov_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)')}"

_VOCAB_OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST({tokens_sql('LOWER(text)')}) AS term
  FROM documents
),
vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS cf FROM toks GROUP BY term
    ORDER BY cf DESC, term LIMIT {_VOCAB_SIZE}
  )
),
flagged AS (
  SELECT lang, CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks LEFT JOIN vocab ON toks.term = vocab.term
),
agg AS (
  SELECT lang, COUNT(*) AS total_tokens,
         SUM(oov) AS oov_tokens
  FROM flagged GROUP BY lang
)
SELECT lang, total_tokens, CAST(oov_tokens AS BIGINT) AS oov_tokens,
       {_OOV_RATE} AS oov_rate
FROM agg ORDER BY lang
"""


@plan("vocab_coverage_oov", oracle=_VOCAB_OOV_ORACLE)
def vocab_coverage_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit audit: build the top-V vocabulary by collection
    frequency, then measure each language's out-of-vocabulary token
    rate under it — the coverage report a tokenizer-training run
    produces before freezing a vocab (a language whose OOV rate is
    high is under-served and will fragment into bytes/unks).

    Scale shape: one tokenize scan feeds BOTH sides — made TRUE by
    localCheckpointing the PACKED (lang, tokens-array) relation BEFORE
    the explode (VERDICT r6 #5 introduced the checkpoint because
    Catalyst does not share subplans; ADVICE r7 #2 moved it ahead of
    the explode: the post-explode materialization was one row per token
    OCCURRENCE — the largest relation in the query, sitting in
    non-reliable executor block storage — while the array-packed form
    holds the same bytes in documents-count rows, the pattern the
    winnowing plans already use). Each branch explodes the checkpointed
    arrays — a columnar re-read, never a re-tokenize. The vocabulary is
    a vocabulary-sized aggregate cut to V rows (TakeOrderedAndProject)
    and broadcast back; OOV flagging is a broadcast LEFT join (no
    data-sized shuffle keyed on term); the final rollup is
    languages-sized. The deterministic (cf DESC, term) boundary makes
    the vocabulary — and therefore the whole report — reproducible
    across engines and runs."""
    from venus_spark.lineage import ckpt

    packed = ckpt(
        load_table(spark, sf_dir, "documents")
        .select("lang", tokens(F.lower(F.col("text"))).alias("_toks"))
    )
    toks = packed.select("lang", F.explode("_toks").alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.col("cf").desc(), "term")
        .limit(_VOCAB_SIZE)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "term", "left").select(
        "lang",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum("oov").cast("long").alias("oov_tokens"),
        )
        .select("lang", "total_tokens", "oov_tokens", F.expr(_OOV_RATE).alias("oov_rate"))
        .orderBy("lang")
    )




# --------------------------------------------------------------------------
# Tokenizer fertility: characters consumed per produced token, by language
# --------------------------------------------------------------------------

# BIGINT/BIGINT promotes to double identically in both engines; shared
# strings so neither ratio can fork between Spark and the oracle.
_CHARS_PER_TOKEN = (
    f"{dround_sql('CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE)')}"
)
_TOKENS_PER_DOC = (
    f"{dround_sql('CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)')}"
)

_FERTILITY_ORACLE = f"""
WITH t AS (
  SELECT lang,
         LENGTH(text) AS n_chars,
         LEN({tokens_sql('LOWER(text)')}) AS n_toks
  FROM documents
),
agg AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens
  FROM t GROUP BY lang
)
SELECT lang, n_docs, total_chars, total_tokens,
       {_CHARS_PER_TOKEN} AS chars_per_token,
       {_TOKENS_PER_DOC} AS tokens_per_doc
FROM agg ORDER BY lang
"""


@plan("tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit — characters consumed per produced
    token and tokens per document, by language: the compression-rate
    report a tokenizer-fitting run reads next to the OOV table
    (``vocab_coverage_oov``). A language whose chars-per-token runs hot
    is being fragmented (each token carries little text — the fertility
    problem multilingual BPE vocabularies are tuned against); one whose
    tokens-per-doc collapses signals truncated or boilerplate content.

    Scale shape: one narrow scan computing two per-row integers, one
    partial-aggregating languages-keyed groupBy, integer sums with two
    closing divisions — nothing here grows with corpus size except the
    single scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.length("text").alias("n_chars"),
        F.size(tokens(F.lower(F.col("text")))).alias("n_toks"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            F.expr(_CHARS_PER_TOKEN).alias("chars_per_token"),
            F.expr(_TOKENS_PER_DOC).alias("tokens_per_doc"),
        )
        .orderBy("lang")
    )
