"""Training-data pipeline plans, part 8: product quantization (PQ)
retrieval — the memory-bandwidth lever for ANN at 100 TB scale.

IVF (sim_ivf_topk) prunes WHICH vectors a query touches; PQ shrinks the
COST of each touched vector: encode every vector once at write time as
m subspace code ids, then answer queries with an asymmetric-distance
(ADC) scan — per subspace, look the code up in a k_s-entry table of
precomputed query-to-codeword distances and sum the m lookups. The scan
reads m bytes per vector instead of 4*dim and does m array lookups
instead of dim multiplies (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature; the reference
has no vector surface, SURVEY.md §2C).

Kernel and constants live in :mod:`venus_spark.operators.similarity`
(PQ_M/PQ_DSUB/PQ_KS/PQ_CB_MOD); the codebook is a deterministic coreset
sample rather than offline k-means — Lloyd refinement is demonstrated
separately by ``kmeans_refine``; sampling keeps the whole plan
in-engine and parity-checkable while preserving the exact encode/ADC
dataflow a trained codebook would use.

Parity discipline: all distances are the shared left-fold L2² kernel
(:func:`venus_spark.functions.l2sq` / ``l2sq_sql``) over doubles, ties
broken on the lower code id / vec_id in both engines, and the Spark
side's driver-computed ADC lookup tables use the same left-to-right
Python float fold (IEEE double) the oracle's LIST_REDUCE performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.functions import l2sq, dround
from venus_spark.functions.sqlgen import dround_sql, l2sq_sql
from venus_spark.operators import similarity as sim
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

_PQ_K = 10
_PQ_QUERY_ID = 0

_VDBL = "LIST_TRANSFORM({0}, x -> CAST(x AS DOUBLE))"


def _pq_cte_prefix() -> str:
    """Shared oracle CTEs: codebook sample, query, encode, LUT, ADC."""
    d = sim.PQ_DSUB
    sub = f"v[(CAST(j AS INT) * {d} + 1):(CAST(j AS INT) * {d} + {d})]"
    qsub = f"qv[(CAST(j AS INT) * {d} + 1):(CAST(j AS INT) * {d} + {d})]"
    csub = f"cv[(CAST(j AS INT) * {d} + 1):(CAST(j AS INT) * {d} + {d})]"
    return f"""
WITH cb AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cb_id,
         {_VDBL.format('embedding')} AS cv
  FROM (SELECT * FROM embeddings WHERE vec_id % {sim.PQ_CB_MOD} = 0
        ORDER BY vec_id LIMIT {sim.PQ_KS})
),
q AS (
  SELECT {_VDBL.format('embedding')} AS qv FROM embeddings
  WHERE vec_id = {_PQ_QUERY_ID}
),
subs AS (SELECT j FROM RANGE({sim.PQ_M}) t(j)),
-- encode: nearest codeword per (vector, subspace), lower cb_id on ties
enc AS (
  SELECT vec_id, j, cb_id,
         {l2sq_sql(sub, csub)} AS d
  FROM (SELECT vec_id, {_VDBL.format('embedding')} AS v FROM embeddings)
  CROSS JOIN subs CROSS JOIN cb
),
codes AS (
  SELECT vec_id, j, cb_id FROM enc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cb_id) = 1
),
-- ADC lookup table: query-to-codeword distance per (subspace, code)
lut AS (
  SELECT j, cb_id, {l2sq_sql(qsub, csub)} AS ld
  FROM cb CROSS JOIN subs CROSS JOIN q
),
adc AS (
  SELECT vec_id,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
                                  LIST(ld ORDER BY j)),
                     (acc, x) -> acc + x) AS adist
  FROM codes JOIN lut USING (j, cb_id)
  GROUP BY vec_id
)"""


def _pq_oracle() -> str:
    return f"""{_pq_cte_prefix()},
exact AS (
  SELECT vec_id, {l2sq_sql('v', '(SELECT qv FROM q)')} AS edist
  FROM (SELECT vec_id, {_VDBL.format('embedding')} AS v FROM embeddings)
)
SELECT vec_id,
       {dround_sql('adist')} AS adc_l2sq,
       {dround_sql('edist')} AS exact_l2sq
FROM adc JOIN exact USING (vec_id)
ORDER BY adist, vec_id LIMIT {_PQ_K}
"""


def _pq_prepared_oracle() -> str:
    return f"""{_pq_cte_prefix()}
SELECT vec_id, {dround_sql('adist')} AS adc_l2sq
FROM adc ORDER BY adist, vec_id LIMIT {_PQ_K}
"""


def _collect_codebook(cb_df: DataFrame) -> list[list[float]]:
    """Driver-side codebook fetch (PQ_KS rows, broadcast-sized) —
    shared by the prepared and live ADC plans (review r11 pass-4 #4)."""
    return [
        [float(x) for x in r["cv"]] for r in cb_df.orderBy("cb_id").collect()
    ]


def _adc_topk(codes_df: DataFrame, lut: list[list[float]]) -> DataFrame:
    """The ADC scan + top-k tail over a codes relation — ONE copy so a
    parity-relevant change (tie-break, rounding) cannot diverge between
    the prepared plan and its live twin (review r11 pass-4 #4)."""
    return (
        codes_df.select(
            "vec_id", sim.pq_adc_dist("codes", lut).alias("adist")
        )
        .orderBy("adist", "vec_id")
        .limit(_PQ_K)
        .select("vec_id", dround("adist").alias("adc_l2sq"))
    )


def _query_vec(df: DataFrame) -> list[float]:
    qrow = (
        df.filter(F.col("vec_id") == _PQ_QUERY_ID).select("embedding").first()
    )
    return [float(x) for x in qrow["embedding"]]


@plan("sim_pq_adc_topk", oracle=_pq_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode + ADC top-k in ONE whole-stage-codegen scan.

    The codebook (<= 16 rows) and query vector are the only driver-side
    fetches — the same bounded pattern as the other query-vector plans.
    From them the plan builds per-subspace literal codeword arrays and a
    literal ADC lookup table, so the scan itself does: for each of the m
    subspaces, argmin over k_s literal-array L2² folds (codegen
    arithmetic, no shuffle, no join), then an m-term lookup sum. Nothing
    wide ever moves: the plan's only exchange is the final
    TakeOrderedAndProject merge. The exact_l2sq column is the per-row
    audit of how well ADC approximates the true distance.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    codebook = sim.pq_codebook_rows(emb)
    q = _query_vec(emb)
    lut = sim.pq_lut(q, codebook)

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    t = emb.select("vec_id", v.alias("v")).withColumn(
        "codes", sim.pq_codes_col("v", codebook)
    )
    qlit = F.array(*[F.lit(x) for x in q])
    return (
        t.select(
            "vec_id",
            sim.pq_adc_dist("codes", lut).alias("adist"),
            l2sq(F.col("v"), qlit).alias("edist"),
        )
        .orderBy("adist", "vec_id")
        .limit(_PQ_K)
        .select(
            "vec_id",
            dround("adist").alias("adc_l2sq"),
            dround("edist").alias("exact_l2sq"),
        )
    )


@plan("sim_pq_adc_prepared", oracle=_pq_prepared_oracle())
def sim_pq_adc_prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k served from the prepared PQ index
    (prepared.embeddings_pq): the encode half ran once at write time, so
    the query scans the 8-byte ``codes`` column — 32x less bandwidth
    than the float32 vectors — and does PQ_M literal-array lookups per
    row. This is the steady-state shape of a PQ deployment; the
    recompute twin (sim_pq_adc_topk) is the write-time audit. Same
    oracle pipeline: the layout changes the access path, not the
    answer."""
    from venus_spark.prepared import embeddings_pq

    codes_df, cb_df = embeddings_pq(spark, sf_dir)
    codebook = _collect_codebook(cb_df)
    q = _query_vec(load_table(spark, sf_dir, "embeddings"))
    return _adc_topk(codes_df, sim.pq_lut(q, codebook))


@plan("sim_pq_adc_live", oracle=_pq_prepared_oracle())
def sim_pq_adc_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_pq_adc_prepared over the LIVE vector set (VERDICT r10 #1,
    the PQ twin of ``sim_ivf_topk_live``): the prepared codes table ∪
    the streamed sink's PENDING batches (landed, not yet committed to
    the codes layout's abatch manifest — the crash window the
    checkpoint replay heals), the pending side encoded on the fly
    against the SAME immutable saturated codebook the write-time
    maintenance uses, so live encode == appended encode by
    construction. Quiescent dirs degrade to exactly the prepared
    codes-column scan; the pending union is micro-batch-sized and
    engages only when the manifest says a batch is in flight."""
    from venus_spark.plans.pipeline_ops2 import _live_vector_candidates
    from venus_spark.prepared import (
        _pq_code_rows,
        _pq_saturated_codebook,
        embeddings_pq,
    )

    codes_df, cb_df = embeddings_pq(spark, sf_dir)
    codebook = _collect_codebook(cb_df)
    q = _query_vec(load_table(spark, sf_dir, "embeddings"))
    lut = sim.pq_lut(q, codebook)

    def encode_pending(pend):
        # the saturation gate runs exactly when this plan ENCODES
        # (pending batches exist — review r11 pass-3 #6): an
        # unsaturated sample would make the live encode diverge from
        # what a rebuild would store, the same append != rebuild
        # hazard the write-time maintenance refuses; quiescent dirs
        # never reach here and keep the degrade-to-prepared contract
        # even on a corpus too small to saturate.
        if len(codebook) < sim.PQ_KS:
            _pq_saturated_codebook(spark, sf_dir, cb_df=cb_df)  # raises
        return _pq_code_rows(pend, codebook)

    live_codes = _live_vector_candidates(
        spark,
        sf_dir,
        codes_df.select("vec_id", "label", "codes"),
        "embeddings_pq_codes.parquet",
        probed_labels=None,
        project=encode_pending,
    )
    return _adc_topk(live_codes, lut)


# --------------------------------------------------------------------------
# Semantic dedup keep-set (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space (the given `label` column plays the k-means
# cluster id, as in sim_cosine_pairs/sim_ivf_*), form near-dup pairs only
# WITHIN a cluster, and keep one representative per near-dup
# neighborhood — the greedy lowest-id rule: a vector is dropped iff a
# lower-id vector in its cluster sits above the cosine threshold. Same
# pair predicate and threshold as sim_cosine_pairs, so the two plans are
# the pairs view and the keep view of one operation.
# --------------------------------------------------------------------------

_SEM_T = 0.35  # = pipeline_ops._COS_PAIR_T (one near-dup band corpus-wide)

_SEM_KEEP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, {_VDBL.format('embedding')} AS v FROM embeddings
),
p AS (
  SELECT b.vec_id AS id_b
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {dround_sql(f'{{cos}}')} > {_SEM_T}
)
SELECT e.vec_id, e.label FROM e
WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.id_b = e.vec_id)
ORDER BY e.vec_id
"""


def _sem_keep_oracle() -> str:
    from venus_spark.functions.sqlgen import cosine_sql

    return _SEM_KEEP_ORACLE.format(cos=cosine_sql("a.v", "b.v"))


@plan("dedup_semantic_keep", oracle=_sem_keep_oracle())
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-set: drop every vector with a lower-id
    above-threshold neighbor in its embedding cluster; emit the
    survivors. The pair join is confined to cluster buckets (at 100 TB
    the cluster id is the storage partition key, so it is
    co-partitioned and shuffle-free) and the drop side collapses to a
    distinct id set — the anti-join is on a uniform key. Within-cluster
    pair formation is quadratic in the bucket BY DESIGN (SemDeDup's own
    semantics); the paper-scale posture is a cluster count that grows
    with the corpus (k ~ 10^4-10^5 for web-scale sets), keeping buckets
    near-constant — the driver corpus fixes k=10, so this plan's bench
    cost overstates the production per-row cost. Composition:
    sim_cosine_pairs emits these pairs, this plan applies the keep
    policy; curated_corpus applies the same policy shape to MinHash
    clusters on the text side."""
    from venus_spark.operators.similarity import cosine_pairs_in_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    drops = (
        cosine_pairs_in_buckets(emb, threshold=_SEM_T)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        emb.join(drops, "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# IVF-PQ: the full FAISS-style ANN composition — coarse quantizer prunes
# WHICH cluster directories are read (IVF, static partition filter over
# the label-partitioned codes table), PQ shrinks the COST of each read
# row (8-byte codes + ADC lookup-sum). At 100 TB this is the deployed
# shape: nprobe/n_clusters of the corpus touched, 32x less bandwidth on
# what is touched, no vector arithmetic in the scan.
# --------------------------------------------------------------------------

# One probe width corpus-wide: drift between the IVF and IVF-PQ plans
# would make their recall numbers incomparable.
from venus_spark.plans.pipeline_ops2 import _NPROBE as _IVFPQ_NPROBE  # noqa: E402


def _ivfpq_oracle() -> str:
    from venus_spark.functions.sqlgen import cosine_sql, davg_sql

    return f"""{_pq_cte_prefix()},
long_cent AS (
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
probed AS (
  SELECT cluster,
         {dround_sql(f'''{cosine_sql('cent_arr.centroid', 'q.qv')}''')} AS centroid_sim
  FROM cent_arr CROSS JOIN q
  ORDER BY centroid_sim DESC, cluster LIMIT {_IVFPQ_NPROBE}
)
SELECT a.vec_id, {dround_sql('a.adist')} AS adc_l2sq
FROM adc a JOIN embeddings e ON a.vec_id = e.vec_id
WHERE e.label IN (SELECT cluster FROM probed)
ORDER BY a.adist, a.vec_id LIMIT {_PQ_K}
"""


@plan("sim_ivfpq_topk", oracle=_ivfpq_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search over the prepared layouts: score the query against
    the materialized centroid table (broadcast-sized), collect the
    nprobe winning cluster ids (bounded driver fetch, same two-phase
    idiom as sim_ivf_topk_prepared — a literal IN beats hoping for DPP),
    plant them as a static partition filter on the label-partitioned
    codes table, and ADC-scan only those directories. The scan touches
    neither unprobed clusters nor any float vector; its physical plan
    shows PartitionFilters on label and a codes-only ReadSchema
    (shape-tested)."""
    from venus_spark.functions import cosine
    from venus_spark.prepared import embeddings_ivf, embeddings_pq

    codes_df, cb_df = embeddings_pq(spark, sf_dir)
    _, cents = embeddings_ivf(spark, sf_dir)
    codebook = [
        [float(x) for x in r["cv"]] for r in cb_df.orderBy("cb_id").collect()
    ]
    q = _query_vec(load_table(spark, sf_dir, "embeddings"))
    lut = sim.pq_lut(q, codebook)
    qlit = F.array(*[F.lit(x) for x in q])

    probed = (
        cents.select(
            "cluster", dround(cosine(F.col("centroid"), qlit)).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col("cluster"))
        .limit(_IVFPQ_NPROBE)
        .collect()
    )
    pruned = codes_df.filter(
        F.col("label").isin([r["cluster"] for r in probed])
    )
    return (
        pruned.select("vec_id", sim.pq_adc_dist("codes", lut).alias("adist"))
        .orderBy("adist", "vec_id")
        .limit(_PQ_K)
        .select("vec_id", dround("adist").alias("adc_l2sq"))
    )


# --------------------------------------------------------------------------
# IVF-PQ recall audit: does coarse pruning + 8-byte codes change the
# retrieved set? Recall@k of sim_ivfpq_topk against the exact float
# L2 top-k — the accept/reject gate for shipping the compressed index,
# composing quant_recall_topk's audit shape with the IVFPQ plan.
# --------------------------------------------------------------------------


def _ivfpq_recall_oracle() -> str:
    from venus_spark.functions.sqlgen import cosine_sql, davg_sql

    return f"""{_pq_cte_prefix()},
long_cent AS (
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
probed AS (
  SELECT cluster,
         {dround_sql(f'''{cosine_sql('cent_arr.centroid', 'q.qv')}''')} AS centroid_sim
  FROM cent_arr CROSS JOIN q
  ORDER BY centroid_sim DESC, cluster LIMIT {_IVFPQ_NPROBE}
),
approx AS (
  SELECT a.vec_id
  FROM adc a JOIN embeddings e ON a.vec_id = e.vec_id
  WHERE e.label IN (SELECT cluster FROM probed)
  ORDER BY a.adist, a.vec_id LIMIT {_PQ_K}
),
exact AS (
  SELECT vec_id
  FROM (SELECT vec_id, {l2sq_sql('v', '(SELECT qv FROM q)')} AS edist
        FROM (SELECT vec_id, {_VDBL.format('embedding')} AS v FROM embeddings))
  ORDER BY edist, vec_id LIMIT {_PQ_K}
)
SELECT CAST({_PQ_K} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM exact JOIN approx USING (vec_id)) AS BIGINT)
         AS n_common,
       CAST(((SELECT COUNT(*) FROM exact JOIN approx USING (vec_id)) * 1000)
            // {_PQ_K} AS BIGINT) AS recall_permille
"""


@plan("sim_ivfpq_recall", oracle=_ivfpq_recall_oracle())
def sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the full IVF-PQ path (partition-pruned ADC scan over
    stored codes) against the exact float L2 top-k — the audit that
    decides nprobe and the PQ geometry before shipping the index. Two
    top-k scans plus a k-row join; at scale this runs per shard over a
    query sample, same shape."""
    from venus_spark.functions import l2sq

    approx = sim_ivfpq_topk(spark, sf_dir).select("vec_id")
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    qlit = F.array(*[F.lit(x) for x in q])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    exact = (
        emb.select("vec_id", l2sq(v, qlit).alias("edist"))
        .orderBy("edist", "vec_id")
        .limit(_PQ_K)
        .select("vec_id")
    )
    return exact.join(approx, "vec_id").agg(
        F.lit(_PQ_K).cast("long").alias("k"),
        F.count("*").alias("n_common"),
        F.expr(f"(count(*) * 1000) div {_PQ_K}").alias("recall_permille"),
    )


# --------------------------------------------------------------------------
# Zero-shuffle LSH candidate generation: the band self-join rides a
# bucketed layout. At 100 TB the band join is the dedup run's only
# corpus-sized shuffle; this variant removes it entirely.
# --------------------------------------------------------------------------


def _lsh_colocated_oracle() -> str:
    from venus_spark.plans.pipeline_ops import _minhash_oracle

    return _minhash_oracle()


@plan("dedup_minhash_lsh_colocated", oracle=_lsh_colocated_oracle())
def dedup_minhash_lsh_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same answer as dedup_minhash_lsh / _prepared, with the candidate
    self-join served from the bucketed band table
    (prepared.lsh_bands_bucketed): both join sides read the same
    band_hash buckets, so candidate generation needs NO exchange
    (shape-tested) — the only remaining shuffles are candidate-set
    sized (the pair distinct and the verify joins), which are orders
    of magnitude smaller than the corpus. The full prepared-layout
    posture for near-dup dedup: signatures materialized at ingest
    (documents_minhash), band keys bucketed at ingest (this table),
    query time pays only bucket-local joins + bounded verification."""
    from venus_spark.operators.dedup import (
        _verify_candidates,
        band_candidate_pairs,
    )
    from venus_spark.plans.pipeline_ops import _JACCARD_T
    from venus_spark.prepared import documents_minhash, lsh_bands_bucketed

    bands = spark.table(lsh_bands_bucketed(spark, sf_dir))
    cands = band_candidate_pairs(bands)
    idx = documents_minhash(spark, sf_dir)
    toks = idx.select(F.col("doc_id"), F.col("_sh").alias("toks"))
    return _verify_candidates(cands, toks, "doc_id", _JACCARD_T)


@plan("dedup_minhash_lsh_colocated_live", oracle=_lsh_colocated_oracle())
def dedup_minhash_lsh_colocated_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dedup_minhash_lsh_colocated``'s answer over the LIVE view —
    the liveness leg VERDICT r13 #2 asked for: a streamed document
    batch that has landed in the MinHash PENDING list but not yet been
    merged must be visible to the bucketed-layout dedup pass WITHOUT
    rebuilding the band table per micro-batch. Candidates come from
    three legs, each priced for what it is:

    1. merged × merged — the bucketed band self-join, zero exchange
       (identical to the steady-state plan);
    2. pending × merged — a cross-set band join with the O(batch)
       pending side BROADCAST against the bucketed table (the
       incremental-dedup shape: only the batch side is new work);
    3. pending × pending — a self-join over the tiny pending slice.

    Verification runs once over the union of candidates against the
    live index (base ∪ pending). On a quiescent corpus legs 2–3 vanish
    and the plan degrades to ``dedup_minhash_lsh_colocated`` under the
    same oracle; the with-pending half is pinned by the streamed
    agreement test against ``dedup_minhash_lsh_live``. Staleness of
    the bucketed table itself (a MERGE another process ran) is handled
    one level down by the band table's source fingerprint
    (prepared.buckets.lsh_bands_bucketed)."""
    from venus_spark.operators.dedup import (
        _verify_candidates,
        band_candidate_pairs,
        cross_candidate_pairs,
        lsh_bands,
    )
    from venus_spark.plans.pipeline_ops import _JACCARD_T
    from venus_spark.prepared import (
        documents_minhash,
        documents_minhash_live,
        documents_minhash_pending,
        lsh_bands_bucketed,
    )

    bands_bkt = spark.table(lsh_bands_bucketed(spark, sf_dir))
    pend = documents_minhash_pending(spark, sf_dir)
    if pend is None:
        cands = band_candidate_pairs(bands_bkt)
        idx = documents_minhash(spark, sf_dir)
    else:
        pend_bands = lsh_bands(pend)
        mm = band_candidate_pairs(bands_bkt)
        pm = cross_candidate_pairs(
            F.broadcast(pend_bands), bands_bkt,
            left_out="id_p", right_out="id_m",
        ).select(
            F.least("id_p", "id_m").alias("id_a"),
            F.greatest("id_p", "id_m").alias("id_b"),
        )
        pp = band_candidate_pairs(pend_bands)
        cands = mm.unionByName(pm).unionByName(pp).distinct()
        idx = documents_minhash_live(spark, sf_dir)
    toks = idx.select(F.col("doc_id"), F.col("_sh").alias("toks"))
    return _verify_candidates(cands, toks, "doc_id", _JACCARD_T)
