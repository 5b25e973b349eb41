"""Training-data pipeline plans: multimodal columns.

These plans run the *real* Spark plumbing (binary payload column ->
Arrow batches -> ``mapInPandas`` decode/frame-sample with a typed
output schema); only the codec byte-math is a deterministic stub (no
image/audio libraries in this container — see
``venus_spark.operators.multimodal``). Because the stub is pure
byte-length arithmetic, the oracle can recompute it in SQL, so the
whole mapInPandas path is value-checked, not just row-counted.

(Moved verbatim from the accreted pipeline_ops2 module in the r14
domain re-grouping; plan names unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from venus_spark.operators import multimodal as mm
from venus_spark.plans.registry import plan
from venus_spark.sources import load_table

# --------------------------------------------------------------------------
# Multimodal: payload decode -> typed metadata (stub codec, real plumbing)
# --------------------------------------------------------------------------

# The payload is encode(text,'utf-8'), so byte_len == strlen(text) and the
# stub's fake dimensions are pure functions of it (operators/multimodal.py).
_BLEN = "STRLEN(text)"

_MM_DECODE_ORACLE = f"""
SELECT doc_id,
       {_BLEN} AS byte_len,
       64 + {_BLEN} % 512 AS width,
       64 + ({_BLEN} * 7) % 512 AS height,
       ['jpeg', 'png', 'webp'][({_BLEN} % 3) + 1] AS format
FROM documents
"""


@plan("mm_decode_meta", oracle=_MM_DECODE_ORACLE)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas.
    1:1 row shape; parallelism follows the scan partitioning; payloads
    never hit the driver."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.decode_metadata(docs)


_MM_FRAME_ORACLE = f"""
SELECT doc_id,
       f.frame_idx,
       ({_BLEN} // {mm.N_FRAMES})
         + CASE WHEN f.frame_idx < {_BLEN} % {mm.N_FRAMES} THEN 1 ELSE 0 END
         AS frame_len
FROM documents
CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {mm.N_FRAMES - 1})) AS frame_idx) f
"""


@plan("mm_frame_sample", oracle=_MM_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: 1 payload -> N frame rows, the variable
    fan-out shape through mapInPandas (a real sampler swaps the byte-split
    for decoded frames without touching the plumbing)."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(docs)


# Integer aspect-preserving rescale of the stub dims — every operand
# BIGINT, so both engines compute the identical quotients.
_W = f"(64 + {_BLEN} % 512)"
_H = f"(64 + ({_BLEN} * 7) % 512)"
_MM_RESIZE_ORACLE = f"""
SELECT doc_id,
       {_W} AS src_w, {_H} AS src_h,
       ({_W} * {mm.RESIZE_TARGET}) // GREATEST({_W}, {_H}) AS dst_w,
       ({_H} * {mm.RESIZE_TARGET}) // GREATEST({_W}, {_H}) AS dst_h,
       (({_W} * {mm.RESIZE_TARGET}) // GREATEST({_W}, {_H}))
         * (({_H} * {mm.RESIZE_TARGET}) // GREATEST({_W}, {_H})) * 3 AS out_len
FROM documents
"""


@plan("mm_resize", oracle=_MM_RESIZE_ORACLE)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize: decode dims, aspect-preserving integer rescale to
    the vision-model input size, output geometry + resized byte count.
    Same Arrow-batched mapInPandas plumbing as the decode plan; a real
    deployment emits the resized bytes from the identical loop."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.resize_images(docs)


# ASCII corpus (verified: len == strlen for every row), so char ops and
# byte ops agree and the feature row is SQL-recomputable.
_MM_AUDIO_ORACLE = f"""
SELECT doc_id,
       {_BLEN} AS n_bytes,
       {_BLEN} - STRLEN(REPLACE(text, ' ', '')) AS n_space,
       {_BLEN} - STRLEN(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
         text, 'a', ''), 'e', ''), 'i', ''), 'o', ''), 'u', '')) AS n_vowel,
       CASE WHEN text = '' THEN 0
            ELSE CAST(LIST_SUM([ORD(x) FOR x IN STRING_SPLIT(text, '')]) AS BIGINT)
       END AS byte_sum
FROM documents
"""


@plan("mm_audio_features", oracle=_MM_AUDIO_ORACLE)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: payload -> fixed-width feature row
    through the same Arrow-batched path (the MFCC-summary shape). The
    byte-statistics stand-in keeps the whole path value-checked."""
    docs = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.audio_features(docs)


# --------------------------------------------------------------------------
# Multimodal payload dedup: exact-byte dedup over the opaque binary
# column — the first pass every image/audio corpus runs (identical
# files recur massively in web crawls), and deliberately DIFFERENT
# from doc_fingerprint: this hashes the raw payload bytes with no text
# normalization, so it applies to any binary modality unchanged.
# --------------------------------------------------------------------------

_MM_DEDUP_ORACLE = """
SELECT MD5(text) AS payload_md5,
       COUNT(*) AS n_payloads,
       MIN(doc_id) AS keeper_doc
FROM documents
GROUP BY MD5(text)
HAVING COUNT(*) >= 2
ORDER BY payload_md5
"""


@plan("mm_payload_dedup", oracle=_MM_DEDUP_ORACLE)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate binary payloads by content hash, lowest doc_id as the
    canonical keeper. One hash-partitioned aggregate on the uniform
    md5 key — at 100 TB the md5 computes where the bytes live and only
    32-byte digests shuffle, never payloads. The oracle hashes the
    source text directly: the payload is its UTF-8 encoding, so the
    digests coincide (DuckDB MD5 hashes the varchar's UTF-8 bytes) —
    which is exactly the audit that the binary plumbing is lossless."""
    from venus_spark.operators.multimodal import attach_payload

    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.md5("payload").alias("payload_md5"))
        .groupBy("payload_md5")
        .agg(F.count("*").alias("n_payloads"), F.min("doc_id").alias("keeper_doc"))
        .filter(F.col("n_payloads") >= 2)
        .orderBy("payload_md5")
    )
