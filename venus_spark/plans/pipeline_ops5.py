"""Training-data pipeline plans, part 5: mixture rebalancing, sequence
packing, tokenizer-training primitives, and embedding quantization — the
stages between "curated corpus" and "tokens on the trainer".

Same discipline as parts 1-4: Spark side is built-in column expressions
(whole-stage codegen, no Python in the data path); every oracle is
generated from the same constants as the Spark implementation. All
parity-sensitive arithmetic is integer (counts, hash buckets, integer
division) or the established double/decimal forms from
:mod:`venus_spark.functions`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import bigram_pairs, token_hash31, tokens, dround
from venus_spark.functions.sqlgen import (
    bigram_pairs_sql,
    dround_sql,
    token_hash31_sql,
    tokens_sql,
)
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_TOKS = tokens_sql("text")

# --------------------------------------------------------------------------
# Data-mixture rebalancing: derive per-source keep rates FROM the corpus
# (rebalance toward a uniform source mixture under a global budget),
# then apply them with the deterministic doc hash. Differs from
# stratified_sample (pipeline_ops3), whose rates are fixed constants:
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
# Embedding quantization: symmetric per-vector int8 — the storage/
# bandwidth lever for vector corpora at 100 TB scale. Codes are exact
# integers (parity-trivial); the reconstruction-error audit uses the
# same explicit floor(x + 0.5) rounding in both engines.
# --------------------------------------------------------------------------

_QUANT_ORACLE = f"""
WITH prepared AS (
  SELECT label,
         LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scaled AS (
  SELECT label, v,
         LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) / 127 AS scale
  FROM prepared
),
coded AS (
  SELECT label, scale,
         LIST_TRANSFORM(v, x -> FLOOR(x / scale + 0.5)) AS codes,
         LIST_MAX(
           LIST_ZIP(v, LIST_TRANSFORM(v, x -> FLOOR(x / scale + 0.5)))
             .apply(p -> ABS(CAST(p[2] AS DOUBLE) * scale
                             - CAST(p[1] AS DOUBLE)))
         ) AS max_err
  FROM scaled
  WHERE scale > 0
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(LIST_REDUCE(codes, (a, b) -> a + b) AS BIGINT))
            AS BIGINT) AS code_sum_total,
       {dround_sql('MAX(max_err)', 9)} AS max_abs_err
FROM coded
GROUP BY label
ORDER BY label
"""


@plan("embedding_quantize", oracle=_QUANT_ORACLE)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale = max|x|/127,
    code = floor(x/scale + 0.5) (explicit floor rounding — identical in
    both engines, unlike engine-native round()), reporting per label the
    integer code checksum and the max absolute reconstruction error.
    All math is higher-order array functions over one scan; the groupBy
    key (label) is 64-ary — partial-agg, no data movement beyond the
    final tiny exchange. At scale the codes column (4x smaller than
    float32, 8x than float64) is what you'd persist; this plan is the
    write-time audit that the error bound holds."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    prepared = emb.select("label", v.alias("v"))
    scale = F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)
    scaled = prepared.select("label", "v", scale.alias("scale"))
    codes = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
    )
    max_err = F.array_max(
        F.zip_with(
            F.col("v"),
            codes,
            lambda x, c: F.abs(c.cast("double") * F.col("scale") - x),
        )
    )
    coded = scaled.filter(F.col("scale") > 0).select(
        "label",
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "code_sum"
        ),
        max_err.alias("max_err"),
    )
    return (
        coded.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("code_sum").alias("code_sum_total"),
            dround(F.max("max_err"), 9).alias("max_abs_err"),
        )
        .orderBy("label")
    )

# --------------------------------------------------------------------------
# Quantization recall audit: does int8 change retrieval answers? Exact
# float top-k vs top-k over dequantized vectors, reported as integer
# recall permille — the accept/reject gate for shipping the quantized
# index. Composes embedding_quantize's code math with sim_cosine_topk's
# retrieval shape; all constants shared with those plans.
# --------------------------------------------------------------------------

_QR_K = 10
_QR_QUERY_ID = 0
_VDBL = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"


def _quant_recall_oracle() -> str:
    from venus_spark.functions.sqlgen import cosine_sql

    return f"""
WITH q AS (
  SELECT {_VDBL.format('embedding')} AS qv FROM embeddings
  WHERE vec_id = {_QR_QUERY_ID}
),
v AS (
  SELECT vec_id, {_VDBL.format('embedding')} AS v FROM embeddings
),
s AS (
  SELECT vec_id, v,
         LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) / 127 AS scale
  FROM v
),
dq AS (
  SELECT vec_id,
         LIST_TRANSFORM(v, x -> FLOOR(x / scale + 0.5) * scale) AS vq
  FROM s WHERE scale > 0
),
exact AS (
  SELECT vec_id FROM v CROSS JOIN q
  ORDER BY {dround_sql(f'''{cosine_sql('v', 'qv')}''')} DESC, vec_id LIMIT {_QR_K}
),
quant AS (
  SELECT vec_id FROM dq CROSS JOIN q
  ORDER BY {dround_sql(f'''{cosine_sql('vq', 'qv')}''')} DESC, vec_id LIMIT {_QR_K}
)
SELECT CAST({_QR_K} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM exact JOIN quant USING (vec_id)) AS BIGINT)
         AS n_common,
       CAST(((SELECT COUNT(*) FROM exact JOIN quant USING (vec_id)) * 1000)
            // {_QR_K} AS BIGINT) AS recall_permille
"""


@plan("quant_recall_topk", oracle=_quant_recall_oracle())
def quant_recall_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of int8-quantized retrieval against the exact float
    baseline for the canonical query vector: quantize (same floor(x/
    scale + 0.5) codes as embedding_quantize), dequantize, rank by
    cosine with the sim_cosine_topk tie-break (sim DESC, vec_id), and
    intersect the two k-sets. Two TakeOrderedAndProject scans plus a
    k-row join — nothing driver-side but the one query-vector lookup;
    at scale this audit runs per shard on a sample of queries, same
    shape."""
    from venus_spark.functions import cosine
    from venus_spark.operators.similarity import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(F.col("vec_id") == _QR_QUERY_ID).select("embedding").first()
    )
    q = F.array(*[F.lit(float(x)).cast("double") for x in qrow["embedding"]])

    # Hoist v and scale into projections: referencing the scale
    # EXPRESSION inside the dequantize lambda would inline the whole
    # array_max fold per element — O(dim^2) per row instead of O(dim).
    prepared = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    scaled = prepared.select(
        "vec_id",
        "v",
        (F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)).alias(
            "scale"
        ),
    )
    vq = F.transform(
        F.col("v"),
        lambda x: F.floor(x / F.col("scale") + F.lit(0.5)) * F.col("scale"),
    )

    exact = (
        prepared.select("vec_id", dround(cosine(F.col("v"), q)).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(_QR_K)
        .select("vec_id")
    )
    quant = (
        scaled.filter(F.col("scale") > 0)
        .select("vec_id", dround(cosine(vq, q)).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(_QR_K)
        .select("vec_id")
    )
    return exact.join(quant, "vec_id").agg(
        F.lit(_QR_K).cast("long").alias("k"),
        F.count("*").alias("n_common"),
        F.expr(f"(count(*) * 1000) div {_QR_K}").alias("recall_permille"),
    )


# --------------------------------------------------------------------------
# LSH bucket purity: how well the RP-LSH buckets align with labels — the
# diagnostic that decides whether the bucket key is a usable blocking /
# storage-partition key. Integer shares only; window partitions by
# bucket (bounded cardinality 2^RP_H), never a global sort.
# --------------------------------------------------------------------------


def _bucket_purity_oracle() -> str:
    from venus_spark.operators.similarity import rp_bucket_sql

    b = rp_bucket_sql(_VDBL.format("embedding"))
    return f"""
WITH b AS (
  SELECT CAST({b} AS BIGINT) AS bucket, label FROM embeddings
),
cnt AS (SELECT bucket, label, COUNT(*) AS c FROM b GROUP BY bucket, label),
ranked AS (
  SELECT bucket, label, c,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY c DESC, label) AS rn,
         SUM(c) OVER (PARTITION BY bucket) AS n_vecs,
         COUNT(*) OVER (PARTITION BY bucket) AS n_labels
  FROM cnt
)
SELECT bucket,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(n_labels AS BIGINT) AS n_labels,
       label AS top_label,
       CAST((c * 1000) // n_vecs AS BIGINT) AS top_share_permille
FROM ranked WHERE rn = 1
ORDER BY bucket
"""


@plan("lsh_bucket_purity", oracle=_bucket_purity_oracle())
def lsh_bucket_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-RP-LSH-bucket label mixture: size, distinct labels, dominant
    label and its integer permille share. The aggregation runs on the
    (bucket,label) pair table — already tiny after the first partial
    agg — and every window partitions by bucket, so the plan scales as
    one corpus scan regardless of corpus size."""
    from venus_spark.operators.similarity import as_double, rp_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = emb.select(
        rp_bucket(as_double(F.col("embedding"))).cast("long").alias("bucket"),
        "label",
    )
    cnt = pairs.groupBy("bucket", "label").agg(F.count("*").alias("c"))
    wb = Window.partitionBy("bucket")
    ranked = cnt.select(
        "bucket",
        "label",
        "c",
        F.row_number()
        .over(wb.orderBy(F.desc("c"), "label"))
        .alias("rn"),
        F.sum("c").over(wb).alias("n_vecs"),
        F.count("*").over(wb).alias("n_labels"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "bucket",
            "n_vecs",
            "n_labels",
            F.col("label").alias("top_label"),
            F.expr("(c * 1000) div n_vecs").alias("top_share_permille"),
        )
        .orderBy("bucket")
    )
