"""Deduplication operators: exact (fingerprint groupBy), MinHash + LSH
banding, SimHash, and token-set Jaccard — the standard near-dup stack of
a pretraining data pipeline.

Design for 100 TB:
- Exact dedup shuffles once on the md5 fingerprint (uniform keys, no skew).
- MinHash/SimHash similarity is over word n-gram *shingles* (Broder),
  not unigram token sets: corpora share vocabulary pervasively, so
  unigram Jaccard is high between unrelated documents and LSH buckets
  degenerate (measured on the synthetic corpus: ~30% of ALL pairs above
  0.75 unigram Jaccard → 7.7M candidate pairs from 5k docs; 3-gram
  shingles → ~10² true pairs).
- MinHash: one explode + one groupBy (partial-agg friendly MIN aggregates),
  then a self-join on (band_idx, band_hash) — the LSH trick that turns the
  quadratic all-pairs problem into joins on small buckets.
- SimHash: same shape with SUM aggregates per bit.
- Jaccard is only ever computed on candidate pairs (LSH output or an
  explicit bucket key), never all-pairs.

Everything is built-in column expressions (md5/conv/bitwise/array ops) —
no Python in the hot path. Hash parameters are module constants shared
with the SQL oracle generators in venus_spark/plans/pipeline_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from venus_spark.functions import HASH_P31, shingles, token_hash31, tokens, dround
from venus_spark.operators.text import fingerprint_col

# MinHash permutation parameters: sig_i = min over tokens of
# (A_i * h(tok) + B_i) mod P31. Fixed odd multipliers/offsets (no runtime
# randomness — results must be reproducible across runs and engines).
N_PERM = 12
ROWS_PER_BAND = 3
N_BANDS = N_PERM // ROWS_PER_BAND
PERM_A = (
    1610612741, 805306457, 402653189, 201326611,
    100663319, 50331653, 25165843, 12582917,
    6291469, 3145739, 1572869, 786433,
)
PERM_B = (
    15485863, 32452843, 49979687, 67867967,
    86028121, 104395301, 122949823, 141650939,
    160481183, 179424673, 198491317, 217645177,
)

# 31, not 32: the shingle hashes are token_hash31 values in
# [0, 2^31-2], so bit 31 of every hash is zero — a 32nd vote column
# would be constant (always -count) and the assembled bit always 0:
# one dead aggregate per document and a phantom bit of resolution.
SIMHASH_BITS = 31


def exploded_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (id, distinct word-3-gram shingle) with its 31-bit hash."""
    return df.select(
        id_col, F.explode(shingles(text_col)).alias("tok")
    ).withColumn("h", token_hash31("tok"))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """id + mh_0..mh_{N_PERM-1} MinHash signature columns."""
    toks = exploded_shingles(df, id_col, text_col)
    aggs = [
        F.min((F.lit(PERM_A[i]) * F.col("h") + F.lit(PERM_B[i])) % F.lit(HASH_P31)).alias(f"mh_{i}")
        for i in range(N_PERM)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature into (id, band_idx, band_hash) rows.

    band_hash = md5 of the '-'-joined signature slice — the bucket key for
    the candidate join.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[F.col(f"mh_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                    )
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(id_col, F.explode(bands).alias("band")).select(
        id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash")
    )


def band_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band —
    the one candidate-join semantics, shared by the recompute, the
    prepared-index, and the bucketed-layout paths (which are asserted
    to agree; a forked copy of this join could silently diverge)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def cross_candidate_pairs(
    left_bands: DataFrame,
    right_bands: DataFrame,
    id_col: str = "doc_id",
    left_out: str = "id_a",
    right_out: str = "id_b",
) -> DataFrame:
    """Distinct candidate pairs between TWO band sets (e.g. a new batch
    vs the stored corpus index) sharing any LSH band — the incremental
    counterpart of :func:`band_candidate_pairs`: a plain hash join on
    (band_idx, band_hash) with no a<b self-join constraint, so only the
    left (batch) side is new work per ingest cycle."""
    a = left_bands.alias("a")
    b = right_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"a.{id_col}").alias(left_out),
            F.col(f"b.{id_col}").alias(right_out),
        )
        .distinct()
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band."""
    return band_candidate_pairs(
        lsh_bands(minhash_signatures(df, id_col, text_col), id_col), id_col
    )


def incremental_near_dups(
    new_idx: DataFrame,
    corpus_idx: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    shingle_col: str = "_sh_h",
) -> DataFrame:
    """Near-dup verdicts for a NEW batch against an EXISTING corpus
    index: cross-set LSH band join for candidates, exact Jaccard over
    the stored (hashed) shingle sets for verification. Both inputs are
    index-form rows (``id + mh_* + shingle set`` —
    prepared.documents_minhash / _minhash_rows output), so only the
    batch side is ever new compute — the per-ingest-cycle O(batch)
    screening path shared by the ``dedup_incremental`` plan and the
    streaming ingest's write-time screen. Returns
    (new_doc, dup_doc, jaccard_sim) rows above ``threshold``."""
    cands = cross_candidate_pairs(
        lsh_bands(new_idx, id_col),
        lsh_bands(corpus_idx, id_col),
        id_col=id_col,
        left_out="new_doc",
        right_out="dup_doc",
    )
    a = new_idx.select(
        F.col(id_col).alias("new_doc"), F.col(shingle_col).alias("t_a")
    )
    b = corpus_idx.select(
        F.col(id_col).alias("dup_doc"), F.col(shingle_col).alias("t_b")
    )
    return (
        cands.join(a, "new_doc")
        .join(b, "dup_doc")
        .select(
            "new_doc",
            "dup_doc",
            dround(jaccard(F.col("t_a"), F.col("t_b"))).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") > threshold)
    )


def _verify_candidates(
    cands: DataFrame, toks: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard verification of candidate pairs."""
    a = toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            dround(jaccard(F.col("toks_a"), F.col("toks_b"))).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") > threshold)
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH dedup: band-bucket candidates, then exact
    shingle-set Jaccard verification above ``threshold``. The band join
    bounds the pair expansion; verification only ever touches candidates.

    Lineage cuts on the signature/shingle subtrees tried and REJECTED
    for the default posture (r15): the double evaluations (both sides
    of the band self-join, both sides of the verify join) are
    INDEPENDENT single-task stages that the scheduler overlaps on idle
    cores, so serializing them behind a checkpoint barrier measured
    6-20% slower (interleaved A/B, REPEAT=3) despite halving total
    work — the duplicate passes are hidden by unused parallelism at
    this input's one-row-group geometry. On a SATURATED cluster the
    duplicate CPU is real cost: ``SPARK_GRAFT_SATURATED=1`` enables
    the cuts (:func:`venus_spark.lineage.ckpt_if_saturated`)."""
    from venus_spark.lineage import ckpt_if_saturated

    bands = ckpt_if_saturated(lsh_bands(minhash_signatures(df, id_col, text_col), id_col))
    cands = band_candidate_pairs(bands, id_col)
    toks = ckpt_if_saturated(
        df.select(F.col(id_col), shingles(text_col).alias("toks"))
    )
    return _verify_candidates(cands, toks, id_col, threshold)


def lsh_near_dup_pairs_from_index(
    idx: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "_sh",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs from a PREPARED MinHash index (``id + mh_* +
    shingle array`` — venus_spark.prepared.documents_minhash): bands are
    cheap array expressions over the stored signature and the exact
    verify reads the stored shingle arrays, so the whole
    explode→hash→MIN-aggregate signature pass is skipped at query time.
    This is the write-time-index posture of the reference (its GIN
    indexes are maintained on INSERT) applied to near-dup search — at
    100 TB signatures are computed once per ingested document, not once
    per dedup run."""
    cands = band_candidate_pairs(lsh_bands(idx, id_col), id_col)
    toks = idx.select(F.col(id_col), F.col(shingle_col).alias("toks"))
    return _verify_candidates(cands, toks, id_col, threshold)


def jaccard(a_toks: Column, b_toks: Column) -> Column:
    """Token-set Jaccard similarity (exact, for verifying candidates).

    try_divide, not `/`: two empty sets have union 0 and must yield
    NULL (failing any > threshold filter) — DuckDB's division already
    does, and ANSI `/` would raise DIVIDE_BY_ZERO (same discipline as
    functions.cosine)."""
    inter = F.size(F.array_intersect(a_toks, b_toks))
    union = F.size(a_toks) + F.size(b_toks) - inter
    return F.try_divide(inter, union)


def jaccard_pairs_in_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    toks_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs within explicit buckets (the non-LSH
    baseline; bucket keys bound the pair blow-up). With ``toks_col``,
    ``df`` already carries the comparison-set array (e.g. the prepared
    MinHash index's stored shingles) and nothing is re-tokenized here;
    otherwise the distinct word-token set is built from ``text_col``.

    Executes as an inverted-postings self-join, not an array-pair
    cross product: exploding to (id, element) rows and joining equal
    elements within a bucket materializes a pair only ONCE PER SHARED
    ELEMENT (count = exact |A∩B|), instead of shipping both full set
    arrays on every candidate pair row. Pairs sharing nothing never
    exist (they cannot pass any threshold > 0); cost is
    sum-of-squared-posting-lengths — postings-proportional like the
    BM25 plan, and the standard set-similarity-join shape at scale.
    The size filter (J > t forces t·|B| < |A| < |B|/t) prunes pairs
    before the aggregation."""
    if toks_col is not None:
        # array_distinct defensively: the postings count equals |A∩B|
        # only for element-distinct arrays — a caller passing a raw
        # token array would inflate the count past the true
        # intersection (jaccard_sim could exceed 1). Idempotent and
        # cheap on the already-distinct prepared columns.
        t = df.select(
            id_col, *bucket_cols, F.array_distinct(F.col(toks_col)).alias("toks")
        )
    else:
        t = df.select(
            id_col, *bucket_cols, F.array_distinct(tokens(text_col)).alias("toks")
        )
    # Lineage cut on the postings stream tried and REJECTED for the
    # default posture (r15): the two per-side evaluations are
    # independent stages the scheduler overlaps, so the checkpoint
    # barrier serialized them and measured 10-27% slower (interleaved
    # A/B, REPEAT=3) despite running the explode once. Saturated
    # clusters opt in via SPARK_GRAFT_SATURATED=1 (lineage module).
    from venus_spark.lineage import ckpt_if_saturated

    posts = ckpt_if_saturated(
        t.withColumn("_n", F.size("toks")).select(
            id_col, *bucket_cols, "_n", F.explode("toks").alias("_tok")
        )
    )
    a, b = posts.alias("a"), posts.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a._tok") == F.col("b._tok")
    )
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = (
        cond
        & (F.col("a._n") > F.lit(threshold) * F.col("b._n"))
        & (F.col("b._n") > F.lit(threshold) * F.col("a._n"))
    )
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .agg(F.count("*").alias("_inter"))
    )
    sim = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return inter.select(
        "id_a", "id_b", dround(sim).alias("jaccard_sim")
    ).filter(F.col("jaccard_sim") > threshold)


def containment_pairs_in_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    threshold: float = 0.9,
    toks_col: str = "_sh_h",
) -> DataFrame:
    """Asymmetric set CONTAINMENT pairs C(A→B) = |A∩B| / |A| above
    threshold within explicit buckets: detects documents substantially
    contained in another (quotes, excerpts, supersets) that symmetric
    Jaccard misses when |B| ≫ |A| (Broder's containment measure, the
    second resemblance statistic of the original shingling paper).
    ``df`` is the prepared MinHash index (or any frame carrying a
    distinct comparison-set array in ``toks_col``).

    Same inverted-postings self-join shape as
    :func:`jaccard_pairs_in_buckets` — a pair costs one row per shared
    element, never a full-array ship — but the join keeps BOTH
    orientations (``id`` inequality, not ``<``) because containment is
    directional, and the only sound size prune is one-sided:
    C > t forces |B| ≥ |A∩B| > t·|A|; nothing bounds |A| from below.
    try_divide for the degenerate empty-|A| case (cannot reach the join
    output — empty sets post no rows — but keeps the kernel total)."""
    t = df.select(
        id_col, *bucket_cols, F.array_distinct(F.col(toks_col)).alias("toks")
    )
    # Lineage cut on the postings stream tried and REJECTED for the
    # default posture (r15): see jaccard_pairs_in_buckets — same
    # measured reason, same SPARK_GRAFT_SATURATED=1 opt-in.
    from venus_spark.lineage import ckpt_if_saturated

    posts = ckpt_if_saturated(
        t.withColumn("_n", F.size("toks")).select(
            id_col, *bucket_cols, "_n", F.explode("toks").alias("_tok")
        )
    )
    a, b = posts.alias("a"), posts.alias("b")
    cond = (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")) & (
        F.col("a._tok") == F.col("b._tok")
    )
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (F.col("b._n") > F.lit(threshold) * F.col("a._n"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._n").alias("_na"),
        )
        .agg(F.count("*").alias("_inter"))
    )
    c = F.try_divide(F.col("_inter"), F.col("_na"))
    return inter.select(
        "id_a", "id_b", dround(c).alias("containment")
    ).filter(F.col("containment") > threshold)


def simhash_col_aggs() -> list[Column]:
    """SUM(±1) per bit position over exploded shingle hashes."""
    return [
        F.sum(
            F.when((F.shiftright(F.col("h"), b).bitwiseAND(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(SIMHASH_BITS)
    ]


def simhash_value_col() -> Column:
    """Assemble the SIMHASH_BITS-bit value from the per-bit vote sums."""
    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        out = out + F.when(F.col(f"s_{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(0)
    return out


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document SimHash (bit-majority of shingle hashes)."""
    toks = exploded_shingles(df, id_col, text_col)
    return (
        toks.groupBy(id_col)
        .agg(*simhash_col_aggs())
        .select(id_col, simhash_value_col().alias("simhash"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup *pairs* into duplicate *clusters*: (id, cluster_id)
    where cluster_id = min node id reachable in the pair graph.

    Iterative min-label propagation over symmetrized edges — each round is
    one shuffle join + one partial-aggregated groupBy, with per-round
    checkpointing truncating lineage so round N's plan doesn't re-derive
    rounds 1..N-1. Convergence is O(graph diameter) rounds; near-dup
    graphs are unions of band-clique clusters, so the diameter is small
    by construction (a long chain would need a 0.8-Jaccard path of
    distinct documents). At 100 TB the edge set is the LSH pair output,
    orders of magnitude smaller than the corpus.

    Checkpoint durability follows the session: when a RELIABLE
    checkpoint directory is configured (``spark.sparkContext.
    setCheckpointDir('hdfs://...')`` — the cluster deployment setting),
    every truncation point is written there and an executor loss
    mid-iteration recomputes nothing; otherwise ``localCheckpoint``
    (executor-memory lineage truncation, the single-node default) is
    used. Same plan shape either way.

    Job economy (r15): checkpoints are LAZY (``eager=False``) and the
    convergence probe is join-free — each round's label table carries
    its predecessor (``prev``) so "anything changed?" is a single
    aggregate over the round's own (checkpointed) output, and that one
    aggregate job is also what materializes the round's checkpoint.
    The pre-r15 shape ran 2 + 2×rounds driver-synchronous jobs (eager
    ckpt + a join-based limit/count probe per round); this shape runs
    one compute job per round (the localCheckpoint path — the reliable-
    checkpoint path adds one cache-read write job per round, see
    :func:`venus_spark.lineage.ckpt`), with identical per-round shuffle
    structure (edges⋈labels + groupBy), identical labels, identical
    convergence decision.

    Double-stepping (two propagations per driver iteration — sound
    because min-label propagation is monotone, so step²(x)=x implies
    step(x)=x) was tried and REJECTED (r16, interleaved REPEAT=3 over
    all five consumer plans): near-dup graphs converge in ~2 rounds, so
    halving the driver round-trips buys one probe but costs a wasted
    extra propagation pair and a 2x-deeper per-job DAG — measured
    15-35% slower on every consumer both rounds."""

    from venus_spark.lineage import ckpt as _ckpt

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    # lazy: evaluated once, inside round 1's convergence-probe job
    edges = _ckpt(edges)
    labels = _ckpt(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = _ckpt(
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("nbr_lab", "lab")).alias("lab"),
                F.col("lab").alias("prev"),
            )
        )
        # Full-scan aggregate, not limit(1).count(): sees every
        # partition, so this single job both materializes the lazy
        # checkpoint completely and answers the convergence question
        # (a limit probe would leave partitions to a second, hidden
        # checkpoint-completion job).
        changed = new_labels.agg(
            F.sum((F.col("lab") != F.col("prev")).cast("int"))
        ).first()[0]
        labels = new_labels.drop("prev")
        if not changed:
            break
    else:
        # Exhausting max_iter without a fixed point means the label
        # table still holds INTERMEDIATE values — returning it would
        # silently mislabel every node farther than max_iter hops from
        # its component's min id (a >max_iter-diameter near-dup chain),
        # and downstream keep/drop decisions would be wrong with no
        # diagnostic. Refuse instead: diameter-shaped graphs need a
        # bigger budget (or the pair threshold is admitting junk edges).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations: the pair graph has diameter > max_iter. "
            "Raise max_iter or inspect the edge set for an "
            "unexpectedly long near-dup chain."
        )
    return labels.select("id", F.col("lab").alias("cluster_id"))


def exact_dedup_keep_first(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate groups by canonical fingerprint: (fingerprint, n_copies,
    keep_id = min id). Downstream keeps keep_id and drops the rest —
    at-scale this is one hash-partitioned aggregation, no window needed."""
    return (
        df.withColumn("fingerprint", fingerprint_col(text_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )
