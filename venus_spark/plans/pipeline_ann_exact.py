"""Training-data pipeline plans: exact vector-similarity baselines
and mining — brute-force cosine top-k and bucketed pairs, the IVF
centroid build step, the batched k-NN join, one Lloyd step of k-means,
a deterministic text-hash embedder, and hard-negative mining.

These are the correctness baselines the ANN plans
(pipeline_ann / pipeline_ann_pq) are audited against.

(Moved verbatim from the accreted pipeline_ops/3/6/9/12 modules in the
r14 domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from venus_spark.functions import cosine, davg, dround, dsum, lit_doubles, token_hash31
from venus_spark.functions.sqlgen import (
    cosine_sql,
    davg_sql,
    dround_sql,
    dsum_sql,
    token_hash31_sql,
)
from venus_spark.operators import similarity as sim
from venus_spark.plans.pipeline_ann import _QUERY_VEC_ID, _TOPK, _VD
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

# _QUERY_VEC_ID / _TOPK / _VD are this module's shared constants above.
_COS_PAIR_T = 0.35


def _cosine_expr_sql(a: str, b: str) -> str:
    from venus_spark.functions.sqlgen import cosine_sql

    return cosine_sql(a, b)


_COSINE_TOPK_ORACLE = f"""
WITH q AS (
  SELECT {_VD.format('embedding')} AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
),
scored AS (
  SELECT e.vec_id,
         {dround_sql(f'''{_cosine_expr_sql(_VD.format('e.embedding'), 'q.qv')}''')} AS cosine_sim
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, cosine_sim FROM scored
ORDER BY cosine_sim DESC, vec_id LIMIT {_TOPK}
"""


@plan("sim_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k — the ANN correctness baseline.
    One scan, O(dim) fold per row in codegen, TakeOrderedAndProject."""
    from venus_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").first()
    query = lit_doubles(qrow["embedding"])
    return brute_force_topk(emb, query, k=_TOPK)


_COSINE_PAIRS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_VD.format('embedding')} AS v FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {dround_sql(f'''{_cosine_expr_sql('a.v', 'b.v')}''')} AS cosine_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {dround_sql(f'''{_cosine_expr_sql('a.v', 'b.v')}''')} > {_COS_PAIR_T}
"""


@plan("sim_cosine_pairs", oracle=_COSINE_PAIRS_ORACLE)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold within label
    buckets (bucketing bounds the quadratic pair expansion; at scale the
    bucket key comes from LSH/IVF instead of a given label)."""
    from venus_spark.operators.similarity import cosine_pairs_in_buckets

    return cosine_pairs_in_buckets(
        load_table(spark, sf_dir, "embeddings"), threshold=_COS_PAIR_T
    )


_IVF_CENTROIDS_ORACLE = f"""
WITH exploded AS (
  SELECT label AS cluster, UNNEST({_VD.format('embedding')}) AS v,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS pos
  FROM embeddings
)
SELECT cluster, pos,
       CAST(FLOOR({dsum_sql('v')} / COUNT(v) * 1000000) AS BIGINT) AS centroid_ppm
FROM exploded GROUP BY cluster, pos
"""


@plan("sim_ivf_centroids", oracle=_IVF_CENTROIDS_ORACLE)
def sim_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer build step: per-cluster mean vector computed
    position-wise (posexplode -> groupBy(cluster,pos)): long-and-narrow
    shuffle, uniform keys. Emitted as floor-ppm for engine-stable values."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.col("label").alias("cluster"),
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        ),
    )
    return exploded.groupBy("cluster", "pos").agg(
        F.floor(dsum("v") / F.count("v") * 1000000).alias("centroid_ppm")
    )


# --------------------------------------------------------------------------
# k-NN join: top-k neighbors for EVERY query vector (batched ANN-baseline)
# --------------------------------------------------------------------------

_KNN_K = 3
_KNN_N_QUERIES = 10  # vec_id < 10 are the queries; the rest is the base

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_VD.format('embedding')} AS qv
  FROM embeddings WHERE vec_id < {_KNN_N_QUERIES}
),
base AS (
  SELECT vec_id, {_VD.format('embedding')} AS v
  FROM embeddings WHERE vec_id >= {_KNN_N_QUERIES}
),
scored AS (
  SELECT q.query_id, base.vec_id,
         {dround_sql(f'''{cosine_sql('base.v', 'q.qv')}''')} AS cosine_sim
  FROM base CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cosine_sim FROM ranked WHERE rn <= {_KNN_K}
"""


@plan("knn_join_topk", oracle=_KNN_ORACLE)
def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN *join*: exact cosine top-k for every query
    vector in one pass. The query side broadcasts (queries ≪ base), the
    base never shuffles its vectors; per-query top-k is a window over
    the scored pairs, partitioned on query_id. This is the exact
    baseline; at 100 TB the same join runs per-IVF-cluster
    (sim_ivf_topk's pruning applied per query) so each base partition
    only scores the queries probing it."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        sim.as_double(F.col("embedding")).alias("qv"),
    )
    base = emb.filter(F.col("vec_id") >= _KNN_N_QUERIES).select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        dround(cosine(F.col("v"), F.col("qv"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# One Lloyd iteration of k-means over the embedding table
# --------------------------------------------------------------------------


_KMEANS_ORACLE = f"""
WITH long_cent AS (
  SELECT label AS cluster,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS pos,
         UNNEST({_VD.format('embedding')}) AS v
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
scored AS (
  SELECT e.vec_id, e.label, c.cluster,
         {dround_sql(f'''{cosine_sql(_VD.format('e.embedding'), 'c.centroid')}''')} AS sim
  FROM embeddings e CROSS JOIN cent_arr c
),
assigned AS (
  SELECT vec_id, label, cluster, sim FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, cluster) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT cluster,
       COUNT(*) AS n_assigned,
       COUNT(*) FILTER (WHERE label <> cluster) AS n_moved,
       {davg_sql('sim')} AS avg_sim
FROM assigned GROUP BY cluster
"""


@plan("kmeans_refine", oracle=_KMEANS_ORACLE)
def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step of k-means: seed centroids from the label means,
    re-assign every vector to its nearest centroid (cosine, argmax with
    deterministic tie-break), and report per-cluster membership, move
    count, and mean similarity — the iterative-refinement unit an
    embedding-clustering pipeline runs to convergence.

    Scale shape: the centroid table is k rows and broadcast; scoring is
    a broadcast nested-loop over a single scan of the vectors; the
    argmax is MAX(struct(sim, -cluster)) — a partial-aggregable
    groupBy, NOT a window, so assignment map-side-combines and the only
    shuffle keys on vec_id. The per-cluster rollup is k rows.
    """
    from venus_spark.operators.similarity import as_double, centroid_arrays

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroid_arrays(emb)

    from venus_spark.functions import cosine

    # fan-out tried and REJECTED (r15): the k×n cosine folds over 2000
    # vectors cost less than the added exchange + AQE stage (1.25x
    # slower, REPEAT=3) — the kernel is already amortized per pair.
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        F.col("cluster"),
        dround(
            cosine(as_double(F.col("embedding")), F.col("centroid"))).alias("sim"),
    )
    assigned = (
        scored.groupBy("vec_id", "label")
        .agg(
            F.max(
                F.struct(F.col("sim"), (-F.col("cluster")).alias("negc"))
            ).alias("m")
        )
        .select(
            "vec_id",
            "label",
            (-F.col("m.negc")).alias("cluster"),
            F.col("m.sim").alias("sim"),
        )
    )
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_assigned"),
        F.count(F.when(F.col("label") != F.col("cluster"), 1)).alias("n_moved"),
        davg("sim").alias("avg_sim"),
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
# Hard-negative mining: nearest non-positives per query vector
# --------------------------------------------------------------------------

_HN_N_QUERIES = 8  # vec_id < 8 are the anchors; the rest is the pool
_HN_K = 5
_HN_DUP_T = 0.95  # candidates at/above this cosine are near-dups, not negatives


_HARD_NEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel, {_VD.format('embedding')} AS qv
  FROM embeddings WHERE vec_id < {_HN_N_QUERIES}
),
pool AS (
  SELECT vec_id, label, {_VD.format('embedding')} AS v
  FROM embeddings WHERE vec_id >= {_HN_N_QUERIES}
),
scored AS (
  SELECT q.query_id, pool.vec_id,
         {dround_sql(f'''{cosine_sql('pool.v', 'q.qv')}''')} AS cosine_sim
  FROM pool CROSS JOIN q
  WHERE pool.label <> q.qlabel
),
ranked AS (
  SELECT query_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
         ) AS rn
  FROM scored WHERE cosine_sim < {_HN_DUP_T}
)
SELECT query_id, vec_id, cosine_sim FROM ranked WHERE rn <= {_HN_K}
ORDER BY query_id, cosine_sim DESC, vec_id
"""


@plan("hard_negatives_topk", oracle=_HARD_NEG_ORACLE)
def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor
    vector, the k MOST similar pool vectors that are (a) not positives
    — a different cluster label, the stand-in for "not the same
    underlying item" — and (b) not near-duplicates (cosine below the
    dup ceiling; an unfiltered near-dup mined as a "negative" is a
    false negative that poisons the contrastive loss — the standard
    failure mode this screen removes).

    Scale shape: identical to ``knn_join_topk`` — the anchor side
    broadcasts (anchors ≪ pool), the pool never shuffles its vectors,
    both exclusion predicates apply BEFORE the per-anchor window so the
    ranked set is already clean, and the window partitions on query_id.
    At 100 TB the pool scan becomes the IVF-pruned probe
    (sim_ivf_topk) with the same label/dup filters applied per
    cluster."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _HN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        sim.as_double(F.col("embedding")).alias("qv"),
    )
    pool = emb.filter(F.col("vec_id") >= _HN_N_QUERIES).select(
        "vec_id", "label", sim.as_double(F.col("embedding")).alias("v")
    )
    scored = (
        pool.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            dround(cosine(F.col("v"), F.col("qv"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") < _HN_DUP_T)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HN_K)
        .drop("rn")
        .orderBy("query_id", F.col("cosine_sim").desc(), "vec_id")
    )




