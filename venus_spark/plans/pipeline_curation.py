"""Training-data pipeline plans: corpus curation — deterministic
stratified sampling and the full quality/dedup/decontamination funnel
that produces the training set (shared verbatim with the snapshot-
pinned export).

(Moved verbatim from the accreted pipeline_ops3/4 modules in the r14
domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window  # noqa: E402  (sequence packing)

from venus_spark.functions import davg, dround, shingles, token_hash31, tokens
from venus_spark.functions.sqlgen import (
    davg_sql,
    dround_sql,
    shingles_sql,
    token_hash31_sql,
    tokens_sql,
)
from venus_spark.operators import text as tx
from venus_spark.plans.pipeline_dedup import _minhash_oracle
from venus_spark.plans.pipeline_quality import (
    _MAX_STOP_RATIO,
    _MIN_TOKENS,
    _MIN_TTR,
    _PASS_SQL,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_TOKS = tokens_sql("text")

# --------------------------------------------------------------------------
# Stratified sampling: deterministic hash-based downsampling per stratum
# (rebalance a lang-skewed corpus; reproducible across runs/engines)
# --------------------------------------------------------------------------

# Percent kept per stratum: downsample the dominant language.
_SAMPLE_PCT = {"en": 5}
_SAMPLE_PCT_DEFAULT = 20

_HASH_EXPR = token_hash31_sql("'doc-' || CAST(doc_id AS VARCHAR)")
_STRAT_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {_HASH_EXPR} % 100 <
      CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_PCT.items())}
      ELSE {_SAMPLE_PCT_DEFAULT} END
"""


@plan("stratified_sample", oracle=_STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff
    ``hash(doc_id) % 100 < pct(lang)``. Hash-based (not ``rand()``) so
    the sample is reproducible, stable under retries/restarts, and
    consistent across engines — the property a training-data pipeline
    needs for auditable mixtures. Pure filter: no shuffle, scales as a
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash31(F.concat(F.lit("doc-"), F.col("doc_id").cast("string")))
    pct = F.lit(_SAMPLE_PCT_DEFAULT)
    for lang, p in _SAMPLE_PCT.items():
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return docs.filter((h % 100) < pct).select("doc_id", "lang")


# --------------------------------------------------------------------------
# The full curation funnel in one plan: quality gate AND not a near-dup
# cluster drop AND not benchmark-contaminated — the query that produces
# the training set. Each stage reuses the exact constants of its
# standalone plan, so this composition cannot drift from the parts.
# --------------------------------------------------------------------------

def _curated_oracle() -> str:
    from venus_spark.plans.pipeline_decontam import _BENCH_MAX_ID, _DECON_N

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


@plan("curated_corpus_colocated", oracle=_curated_oracle())
def curated_corpus_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``curated_corpus``'s answer with its ONE corpus-sized shuffle
    removed (r15): the funnel's near-dup stage is the LSH band
    self-join, and in the plain plan that join hash-exchanges the full
    band set (corpus × bands rows) every run. Here candidates come
    from the bucketed band table (``prepared.lsh_bands_bucketed`` —
    both self-join sides read the same ``band_hash`` buckets, ZERO
    exchange, same layout the ``dedup_minhash_lsh_colocated`` plan
    rides), verification reads the stored shingle arrays, and the
    remaining funnel shuffles are all candidate- or
    quality-output-sized. At 100 TB this is the difference between
    re-shuffling the corpus per curation run and a bucket-local scan;
    the quality gate and decontamination legs are unchanged, so the
    plan shares ``curated_corpus``'s oracle verbatim."""
    from venus_spark.operators.dedup import (
        _verify_candidates,
        band_candidate_pairs,
    )
    from venus_spark.plans.pipeline_dedup import _JACCARD_T
    from venus_spark.prepared import documents_minhash, lsh_bands_bucketed

    mh = documents_minhash(spark, sf_dir)
    bands = spark.table(lsh_bands_bucketed(spark, sf_dir))
    toks = mh.select(F.col("doc_id"), F.col("_sh").alias("toks"))
    pairs = _verify_candidates(
        band_candidate_pairs(bands), toks, "doc_id", _JACCARD_T
    )
    return curated_funnel(
        load_table(spark, sf_dir, "documents"), mh, pairs=pairs
    )


def curated_funnel(
    docs: DataFrame,
    mh: DataFrame,
    bench_docs: DataFrame | None = None,
    pairs: DataFrame | None = None,
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
    usually does not contain. ``pairs`` overrides where the verified
    near-dup pair set comes from (default: the LSH band self-join over
    ``mh``) — the colocated twin passes pairs derived from the bucketed
    band table so the funnel's one corpus-sized shuffle disappears."""
    from venus_spark.functions import shingles_of_tokens
    from venus_spark.lineage import ckpt
    from venus_spark.operators.dedup import (
        connected_components,
        lsh_near_dup_pairs_from_index,
    )
    from venus_spark.plans.pipeline_dedup import _JACCARD_T
    from venus_spark.plans.pipeline_decontam import _BENCH_MAX_ID, _DECON_N

    corpus = docs.filter(F.col("doc_id") >= _BENCH_MAX_ID)

    if pairs is None:
        pairs = lsh_near_dup_pairs_from_index(mh, threshold=_JACCARD_T)
    labels = connected_components(pairs)
    dup_drop = labels.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )

    # Tokenize the corpus ONCE (r16, VERDICT r15 #3): the quality-gate
    # predicates and the decontamination shingles both derive from the
    # same whitespace tokenization, but expressed directly each
    # reference re-inlines the tokenizer (CollapseProject): the r15
    # funnel's explain shows 13 split() copies in the quality Filter
    # and 13 more inside the shingle Generate — the corpus paid ~26
    # tokenize passes per run. The lineage barrier pins exactly one;
    # what crosses it is (doc_id, lang, source, token-array) — the
    # same corpus-narrow class as the curriculum_order checkpoint.
    toked = ckpt(
        corpus.select(
            "doc_id", "lang", "source", tokens("text").alias("_toks")
        )
    )

    bench_grams = (
        (docs if bench_docs is None else bench_docs)
        .filter(F.col("doc_id") < _BENCH_MAX_ID)
        .select(F.explode(shingles("text", _DECON_N)).alias("g"))
        .distinct()
    )
    contaminated = (
        toked.select(
            "doc_id",
            F.explode(shingles_of_tokens(F.col("_toks"), _DECON_N)).alias("g"),
        )
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )

    gated = tx.quality_features(toked, tokens_col="_toks").filter(
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


# --------------------------------------------------------------------------
# Data-mixture rebalancing: derive per-source keep rates FROM the corpus
# (rebalance toward a uniform source mixture under a global budget),
# then apply them with the deterministic doc hash. Differs from
# stratified_sample (pipeline_curation), whose rates are fixed constants:
# here the rates are data-dependent, the two-phase shape a mixture tool
# actually has. All rate arithmetic is BIGINT (permille, integer
# division) so both engines derive bit-identical rates.
# --------------------------------------------------------------------------

# Global budget as permille of the corpus, split evenly across sources.
_MIX_BUDGET_PERMILLE = 300
_MIX_HASH = "'mix-' || CAST(doc_id AS VARCHAR)"

_MIXTURE_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
),
totals AS (
  SELECT SUM(cnt) AS total, COUNT(*) AS n_sources FROM counts
),
rates AS (
  -- CAST: SUM() yields HUGEINT in DuckDB, which pandas renders float64
  SELECT source,
         CAST(LEAST(1000, (total * {_MIX_BUDGET_PERMILLE})
                          // (n_sources * cnt)) AS BIGINT)
           AS keep_permille
  FROM counts, totals
)
SELECT d.doc_id, d.source, r.keep_permille
FROM documents d
JOIN rates r USING (source)
WHERE {token_hash31_sql(_MIX_HASH)} % 1000 < r.keep_permille
ORDER BY d.doc_id
"""


@plan("mixture_sample", oracle=_MIXTURE_ORACLE)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a uniform source mixture under a
    global token budget: per-source quota = budget / n_sources, keep
    rate = min(1, quota / source_count), applied as the deterministic
    ``hash(doc_id) % 1000 < rate`` filter. Phase 1 is one tiny groupBy
    (one row per source); phase 2 broadcasts the 20-row rate table back
    onto the corpus scan — no second shuffle, no rand(), reproducible
    across engines and retries. At 100 TB the rate table is still 20
    rows; the corpus is still scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    # Lineage-cut on counts tried and REJECTED (r15): the re-evaluated
    # 20-row groupBy costs less than the checkpoint's job barrier
    # (1.30x slower, REPEAT=3).
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_sources")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1000).cast("long"),
            F.expr(f"(total * {_MIX_BUDGET_PERMILLE}) div (n_sources * cnt)"),
        ).alias("keep_permille"),
    )
    h = token_hash31(F.concat(F.lit("mix-"), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(rates), "source")
        .filter((h % 1000) < F.col("keep_permille"))
        .select("doc_id", "source", "keep_permille")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-size training sequences by
# cumulative token count, per shard. The shard key is the scale unit —
# the window function partitions by shard, so no global sort ever
# happens; shards are independent and the layout is reproducible.
# --------------------------------------------------------------------------

_PACK_SEQ_TOKENS = 2048
_PACK_SHARDS = 16
_SHARD_HASH = "'shard-' || CAST(doc_id AS VARCHAR)"

_PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id,
         {token_hash31_sql(_SHARD_HASH)} % {_PACK_SHARDS} AS shard,
         LEN({_TOKS}) AS n_tokens
  FROM documents
),
placed AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM sized
)
SELECT shard,
       CAST((cum - n_tokens) // {_PACK_SEQ_TOKENS} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tok_started,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY shard, seq_id
ORDER BY shard, seq_id
"""


@plan("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: hash documents into {_PACK_SHARDS}
    shards, order deterministically within each shard, and chop the
    concatenated token stream into {_PACK_SEQ_TOKENS}-token training
    sequences (a document starts in sequence ``floor(preceding_tokens /
    seq_len)``). The manifest reports docs-per-sequence and token fill.
    The window partitions BY SHARD — the single-partition global-sort
    trap does not exist here; 100 TB is just more shards, each an
    independent sorted run (in production the shard count rises with
    the cluster, the per-shard work is unchanged)."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        token_hash31(F.concat(F.lit("shard-"), F.col("doc_id").cast("string")))
        % _PACK_SHARDS
    )
    sized = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        placed.groupBy(
            "shard",
            F.expr(f"(cum - n_tokens) div {_PACK_SEQ_TOKENS}").alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tok_started"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "seq_id")
    )


# --------------------------------------------------------------------------
# Leakage-free split assignment: train/val/test by key hash, with the
# per-(split, source) accounting a dataset card reports. Hash-based (not
# rand()) so the split is reproducible, stable under retries, and a
# document can never migrate between splits across runs/engines.
# --------------------------------------------------------------------------

_TRAIN_PCT = 80  # [0, 80) -> train
_VAL_PCT = 90  # [80, 90) -> val, [90, 100) -> test

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
# Document chunking: fixed-size token windows with stride/overlap — the
# context-window split every pretraining/RAG pipeline applies before
# tokenized examples are packed (pack_sequences is the downstream twin).
# --------------------------------------------------------------------------

from venus_spark.plans.pipeline_dedup import (  # shared with chunk_dedup_groups
    _CHUNK_STRIDE,
    _CHUNK_TOKENS,
)

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
# Curriculum ordering: length-staged, hash-shuffled training schedule
# --------------------------------------------------------------------------

_CURRICULUM_STAGES = 4

_CURRICULUM_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, LEN({tokens_sql('LOWER(text)')}) AS dl FROM documents
),
staged AS (
  SELECT doc_id, dl,
         NTILE({_CURRICULUM_STAGES}) OVER (ORDER BY dl, doc_id) AS stage,
         {token_hash31_sql('CAST(doc_id AS STRING)')} AS shuffle_key
  FROM dl
)
SELECT doc_id, dl, stage,
       ROW_NUMBER() OVER (
         PARTITION BY stage ORDER BY shuffle_key, doc_id
       ) AS pos_in_stage
FROM staged
ORDER BY stage, pos_in_stage
"""


@plan("curriculum_order", oracle=_CURRICULUM_ORACLE)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule: documents are staged
    short-to-long (sequence-length warmup — the standard curriculum
    that stabilizes early training), and within each stage the order is
    a hash shuffle (token_hash31 of the doc id — engine-portable, no
    RNG), so the schedule is fully reproducible: same corpus, same
    schedule, on any engine.

    Scale shape (VERDICT r6 #1 — this plan used to hold the repo's only
    unpartitioned window, a global NTILE sort through one task): stage
    assignment is now EXACT-NTILE-equivalent with no global window
    anywhere. The global rank of a row in the (dl, doc_id) total order
    decomposes as ``rank = cum_before(dl) + rank_within(dl)``:
    ``cum_before`` comes from the per-length histogram (one partial-agg
    scan; distinct token-lengths are bounded by the max document
    length, so the histogram is a driver-safe few-KB collect — the
    exact-quantile boundary table, broadcast back as a join), and
    ``rank_within`` is a row_number over a window PARTITIONED BY dl
    (ties broken by doc_id — NTILE's own determinism). The NTILE bucket
    formula applied to that exact rank (first N%k stages get one extra
    row) reproduces the oracle's NTILE bit-for-bit; the within-stage
    shuffle window partitions by stage. The only sort touching the full
    corpus is the final output ordering, which IS the deliverable (the
    data-loader's read order) and shuffles by range, not to one task."""
    k = _CURRICULUM_STAGES
    # localCheckpoint: the (doc_id, dl) relation feeds the histogram
    # AND the ranked output — without it the corpus is tokenized twice
    # (the vocab_coverage_oov lesson); the checkpoint is two narrow
    # columns per document.
    from venus_spark.lineage import ckpt

    docs = ckpt(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens(F.lower(F.col("text")))).alias("dl"))
    )
    hist = sorted(
        (int(r["dl"]), int(r["n"]))
        for r in docs.groupBy("dl").agg(F.count("*").alias("n")).collect()
    )
    n_total = sum(n for _, n in hist)
    cum = []
    before = 0
    for dl_v, n in hist:
        cum.append((dl_v, before))
        before += n
    cum_df = spark.createDataFrame(cum, "dl int, cum_before long")
    base, rem = n_total // k, n_total % k
    # NTILE(k) over N rows: the first N%k buckets hold N//k+1 rows, the
    # rest N//k — applied to the exact global rank as pure INTEGER
    # arithmetic (``div``, never a double quotient: a float floor can
    # misround at exact bucket boundaries once ranks grow large).
    big = rem * (base + 1)
    ranked = docs.join(F.broadcast(cum_df), "dl").select(
        "doc_id",
        "dl",
        (
            F.col("cum_before")
            + F.row_number().over(Window.partitionBy("dl").orderBy("doc_id"))
        ).alias("rnk"),
        token_hash31(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    stage_expr = F.when(
        F.col("rnk") <= F.lit(big),
        F.expr(f"(rnk - 1) div {base + 1} + 1"),
    ).otherwise(
        F.expr(f"{rem} + (rnk - {big} - 1) div {max(base, 1)} + 1")
    ).cast("int")
    staged = ranked.select(
        "doc_id", "dl", stage_expr.alias("stage"), "shuffle_key"
    )
    return (
        staged.select(
            "doc_id",
            "dl",
            "stage",
            F.row_number()
            .over(
                Window.partitionBy("stage").orderBy("shuffle_key", "doc_id")
            )
            .alias("pos_in_stage"),
        )
        .orderBy("stage", "pos_in_stage")
    )


