"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring a production ANN stack:

- ``brute_force_topk``: exact cosine top-k against a query vector — the
  correctness baseline. One scan, per-row O(dim) arithmetic in codegen
  (zip_with/aggregate fold), TakeOrderedAndProject for the top-k: no
  shuffle of the vectors themselves.
- IVF-style two-stage search: coarse quantize by a partition key (here
  the ``label`` column plays the cluster id; a real deployment computes
  k-means centroids offline), pick the nearest centroid(s), then
  brute-force only inside those partitions. This is the 100 TB path:
  the scan prunes to the probed partitions.

Embedding near-dup pairs reuse the same cosine kernel within buckets.

All arithmetic is done in DOUBLE after casting the float arrays once —
identical left-fold order as the SQL oracle, so results are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from venus_spark.functions import cosine, dot


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def centroids(df: DataFrame, cluster_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-cluster mean vector, computed position-wise: posexplode ->
    groupBy (cluster, pos) -> exact decimal mean. Long-and-narrow beats
    array-of-structs aggregation for shuffle size and skew."""
    from venus_spark.functions import davg

    exploded = df.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "v"),
    )
    return exploded.groupBy("cluster", "pos").agg(davg("v").alias("centroid_v"))


def brute_force_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` over all rows."""
    sim = cosine(as_double(F.col(vec_col)), query_vec)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def centroid_arrays(
    df: DataFrame, cluster_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Centroids reassembled to one mean-vector array per cluster
    (collect_list over the long-form centroids, ordered by position).
    Output is n_clusters rows — trivially broadcastable."""
    return (
        centroids(df, cluster_col, vec_col)
        .groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "centroid_v"))).alias("pv")
        )
        .select(
            "cluster", F.transform("pv", lambda s: s["centroid_v"]).alias("centroid")
        )
    )


def ivf_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF two-stage ANN: score the query against the (tiny) centroid
    table, keep the ``nprobe`` nearest clusters, then exact top-k only
    inside those clusters.

    At 100 TB the vectors are stored partitioned by cluster id, so the
    probe semi-join becomes partition pruning: the scan never touches
    unprobed clusters. The centroid table stays broadcast-sized by
    construction (n_clusters ≪ n_vectors).
    """
    probed = (
        centroid_arrays(df, cluster_col, vec_col)
        .select(
            "cluster",
            F.round(cosine(F.col("centroid"), query_vec), 6).alias("centroid_sim"),
        )
        .orderBy(F.col("centroid_sim").desc(), F.col("cluster"))
        .limit(nprobe)
    )
    pruned = df.join(
        F.broadcast(probed), df[cluster_col] == probed["cluster"], "left_semi"
    )
    return brute_force_topk(pruned, query_vec, k=k, id_col=id_col, vec_col=vec_col)


# Random-hyperplane LSH: H pseudo-random ±1 hyperplanes. Weight of
# hyperplane h at position i (1-based) is +1 iff ((RP_A[h]*i + RP_B[h])
# mod P31) is even — deterministic, replicated verbatim in the SQL
# oracle. sign-bits concatenate into a bucket id in [0, 2^H).
RP_H = 8
RP_A = (179426549, 179426323, 179425879, 179425661, 15487469, 15487313, 15487291, 15487177)
RP_B = (32452867, 49979693, 67867979, 86028157, 104395303, 122949829, 141650963, 160481219)
_RP_P = 2147483647


def _rp_weight(h: int, i: Column) -> Column:
    # 64-bit arithmetic: RP_A * i would overflow int32 under ANSI mode.
    parity = ((F.lit(RP_A[h]).cast("long") * i + F.lit(RP_B[h])) % _RP_P) % 2
    return F.when(parity == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def rp_projection(vec: Column, h: int) -> Column:
    """Signed projection of ``vec`` onto pseudo-random hyperplane ``h`` —
    a left fold over (value × ±1 weight), same order as the oracle."""
    idx = F.sequence(F.lit(1), F.size(vec))
    terms = F.zip_with(vec, idx, lambda x, i: x * _rp_weight(h, i))
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def rp_bucket(vec: Column) -> Column:
    """Random-hyperplane LSH bucket id: bit h set iff projection_h >= 0."""
    out = F.lit(0)
    for h in range(RP_H):
        out = out + F.when(rp_projection(vec, h) >= 0, F.lit(1 << h)).otherwise(0)
    return out


def rp_lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine top-k restricted to the query's
    sign-random-projection bucket. The bucket id is a pure column
    expression, so at scale it becomes a *storage partition key* — the
    probe reads one partition out of 2^H instead of the full table
    (multi-probe = also scan buckets at hamming distance 1). Recall is
    traded against the 2^H-fold scan reduction; the exact
    ``brute_force_topk`` remains the ground-truth baseline."""
    vecs = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", rp_bucket(F.col("v")))
    qrow = vecs.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("q_bucket"), F.col("v").alias("q_vec")
    )
    in_bucket = vecs.join(F.broadcast(qrow), F.col("bucket") == F.col("q_bucket"))
    sim = cosine(F.col("v"), F.col("q_vec"))
    return (
        in_bucket.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_in_buckets(
    df: DataFrame,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, restricted to
    bucket_col partitions (the blocked/bucketed version of the quadratic
    problem — buckets come from LSH, IVF, or a coarse label)."""
    # Norms are folded once per vector, not once per pair — bit-identical
    # to the per-pair form (same fold order) at 1/3 the arithmetic.
    t = df.select(
        F.col(id_col),
        F.col(bucket_col).alias("bucket"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a, b = t.alias("a"), t.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") > threshold)
    )
