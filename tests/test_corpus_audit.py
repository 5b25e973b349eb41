"""Targeted tests for the corpus-audit plans: directional
containment, cross-source overlap, embedding outliers, EWMA smoothing.
Cross-engine value parity is covered by test_oracle_parity; these pin
the semantics the oracle can't state as crisply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from venus_spark.operators.dedup import (
    containment_pairs_in_buckets,
    jaccard_pairs_in_buckets,
)


@pytest.fixture()
def excerpt_corpus(spark):
    # B is a long document; A is a small excerpt of it: containment
    # C(A->B) = 1.0 while Jaccard(A,B) = 4/40 = 0.1.
    big = list(range(100, 140))
    rows = [
        (1, "en", "web", big[:4]),   # A: 4 shingles, all inside B
        (2, "en", "web", big),       # B: 40 shingles
        (3, "en", "web", [900, 901, 902]),  # unrelated
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, _sh_h array<long>"
    )


def test_containment_catches_excerpt_jaccard_misses(excerpt_corpus):
    got = containment_pairs_in_buckets(
        excerpt_corpus, bucket_cols=["lang", "source"], threshold=0.9
    ).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in got] == [(1, 2, 1.0)]
    # the reverse orientation is NOT emitted: C(B->A) = 4/40
    # and symmetric Jaccard at the dedup threshold misses the pair too
    jac = jaccard_pairs_in_buckets(
        excerpt_corpus,
        bucket_cols=["lang", "source"],
        threshold=0.8,
        toks_col="_sh_h",
    ).collect()
    assert jac == []


def test_containment_is_directional_for_near_equal_sets(spark):
    # A fully inside B, B nearly inside A: both directions emitted when
    # both clear the threshold — pairs are ordered, not deduped to '<'.
    rows = [
        (1, "en", "web", [1, 2, 3, 4, 5, 6, 7, 8, 9]),
        (2, "en", "web", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, _sh_h array<long>"
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in containment_pairs_in_buckets(
            df, bucket_cols=["lang", "source"], threshold=0.85
        ).collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_source_overlap_bounds(spark):
    from venus_spark.plans.pipeline_decontam import source_overlap_ngrams

    rows = source_overlap_ngrams(spark, SF_DIR).collect()
    assert rows, "sf0.001 corpus has cross-source shingle overlap"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.ngram_jaccard <= 1.0
        assert r.shared_ngrams >= 1


def test_embedding_outliers_shape(spark):
    from venus_spark.plans.pipeline_eval import _OUTLIER_N, embedding_outliers

    rows = embedding_outliers(spark, SF_DIR).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        assert len(rs) == _OUTLIER_N
        rs.sort(key=lambda r: r.rn)
        dists = [r.centroid_l2sq for r in rs]
        assert dists == sorted(dists, reverse=True), label


def test_ewma_matches_reference_fold(spark):
    from venus_spark.plans.pipeline_behavioral import _EWMA_A, ewma_smoothing

    got = {
        (r.event_type, r.hour): (r.hourly_avg, r.ewma)
        for r in ewma_smoothing(spark, SF_DIR).collect()
    }
    # recompute one series driver-side from the emitted hourly averages
    etype = next(iter(got))[0]
    series = sorted((h, v) for (t, h), (v, _) in got.items() if t == etype)
    acc = None
    for h, v in series:
        acc = v if acc is None else _EWMA_A * v + (1 - _EWMA_A) * acc
        assert got[(etype, h)][1] == pytest.approx(round(acc, 6), abs=1e-9)


def test_hash_embed_unit_norm(spark):
    from pyspark.sql import functions as F

    from venus_spark.plans.pipeline_ann_exact import text_hash_embed

    emb = text_hash_embed(spark, SF_DIR)
    norms = (
        emb.groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("sq"))
        .collect()
    )
    assert norms
    for r in norms:
        # rounding w to 6 decimals perturbs the norm by < 64 * 1e-6
        assert abs(r.sq - 1.0) < 1e-4, r
