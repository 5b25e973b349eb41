"""Edge-case regression tests for analytics plans, run against tiny
synthetic tables written to a tmp dir (same parquet-table layout the
plans load via ``sources.load_table``)."""

from __future__ import annotations

import datetime as dt

from venus_spark.oracle import compare, duckdb_connect


def _write_events(spark, sf_dir, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")


def test_asof_attribution_null_click_value_not_torn(spark, tmp_path):
    """A click with NULL value must be attributed WHOLE: click_id/ts/value
    all from that click, not value carried from an earlier click (the
    torn-row bug a per-column last() carry would produce)."""
    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # user 1: click(3.0) -> click(NULL value) -> purchase: the NULL
        # click is the as-of match and must win for ALL carried fields.
        (1, t("2024-01-01 10:00:00"), 1, "click", 3.0, "{}"),
        (2, t("2024-01-01 11:00:00"), 1, "click", None, "{}"),
        (3, t("2024-01-01 12:00:00"), 1, "purchase", 9.0, "{}"),
        # user 2: purchase with no prior click -> all click fields NULL.
        (4, t("2024-01-01 12:00:00"), 2, "purchase", 1.0, "{}"),
        # user 3: click strictly after the purchase -> no match.
        (5, t("2024-01-02 09:00:00"), 3, "purchase", 1.0, "{}"),
        (6, t("2024-01-02 10:00:00"), 3, "click", 2.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir, rows)

    from venus_spark.plans import all_plans

    p = all_plans()["asof_join_attribution"]
    got = {r["purchase_id"]: r for r in p.fn(spark, sf_dir).collect()}
    assert got[3]["click_id"] == 2  # the later, NULL-valued click
    assert got[3]["click_value"] is None  # not torn back to 3.0
    assert got[3]["click_ts"] == "2024-01-01 11:00:00.000000"
    assert got[4]["click_id"] is None
    assert got[5]["click_id"] is None

    # And the DuckDB ASOF oracle agrees on the same synthetic table.
    con = duckdb_connect(sf_dir)
    res = compare("asof_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail


def test_gapfill_locf_partitions_by_series(spark, sf_dir):
    """The LOCF window partitions by event_type: every observed series
    appears with a full dense spine, and values never leak across
    series boundaries (each series' first LOCF value is its own)."""
    from venus_spark.plans import all_plans

    df = all_plans()["timeseries_gapfill_locf"].fn(spark, sf_dir)
    pdf = df.toPandas()
    n_series = pdf["event_type"].nunique()
    assert len(pdf) == n_series * 720  # 30 days x 24h dense spine per series
    import pandas as pd

    first = pdf.sort_values(["event_type", "bucket"]).drop_duplicates(
        "event_type", keep="first"
    )
    # Before a series' first observation, LOCF must be NULL (nothing to
    # carry) — a cross-series leak would show the previous series' tail.
    for _, row in first.iterrows():
        assert row["n_events"] > 0 or pd.isna(row["locf_value"])


def test_anomaly_z_guard_survives_degenerate_series(spark):
    """Under ANSI mode a one-bucket or zero-variance series must yield
    NULL z, not a DIVIDE_BY_ZERO runtime error."""
    from pyspark.sql import functions as F

    from venus_spark.plans.pipeline_behavioral import _Z_SCORE

    rows = spark.createDataFrame(
        [
            (5, 1, 5, 25),      # n=1: single bucket
            (3, 4, 12, 36),     # n>1 but zero variance (all c=3)
            (10, 4, 20, 150),   # healthy: genuine spread
        ],
        "c long, n long, s1 long, s2 long",
    )
    got = [r["z"] for r in rows.select(F.expr(_Z_SCORE).alias("z")).collect()]
    assert got[0] is None
    assert got[1] is None
    assert got[2] is not None


def test_quality_features_null_on_zero_token_doc(spark):
    """A zero-token document must yield NULL ratios (dropped by any
    quality gate), not an ANSI DIVIDE_BY_ZERO runtime error — real
    corpora contain empty documents."""
    from venus_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[1]["type_token_ratio"] is None
    assert rows[2]["stopword_ratio"] is None
    assert rows[3]["type_token_ratio"] == 1.0


def test_cosine_pairs_null_on_zero_vector(spark):
    """A zero vector in a bucket must produce NULL similarity (filtered
    out), not a runtime error."""
    from venus_spark.operators.similarity import cosine_pairs_in_buckets

    df = spark.createDataFrame(
        [(1, 0, [0.0, 0.0]), (2, 0, [1.0, 0.0]), (3, 0, [1.0, 0.0])],
        "vec_id long, label int, embedding array<double>",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           cosine_pairs_in_buckets(df, threshold=0.5).collect()}
    assert got == {(2, 3)}


def test_mm_audio_features_empty_text_parity(spark, tmp_path):
    """An empty document must yield byte_sum=0 on BOTH sides: DuckDB's
    STRING_SPLIT('', '') is [''] and ORD('') is -1, which the unguarded
    oracle summed to -1 while Spark computed 0 (ADVICE r3). The oracle's
    empty-text CASE guard keeps the sides equal."""
    df = spark.createDataFrame(
        [(1, "", "en", "src0", 0), (2, "ab c", "en", "src0", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    from venus_spark.plans import all_plans

    p = all_plans()["mm_audio_features"]
    got = {r["doc_id"]: r for r in p.fn(spark, sf_dir).collect()}
    assert got[1]["byte_sum"] == 0 and got[1]["n_bytes"] == 0
    con = duckdb_connect(sf_dir)
    res = compare("mm_audio_empty", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail


def test_connected_components_raises_on_nonconvergence(spark):
    """Exhausting max_iter must raise, not return intermediate labels —
    silent mislabeling would corrupt every downstream keep/drop."""
    import pytest

    from venus_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3).collect()
    # and a budget >= diameter converges fine on the same graph
    labels = connected_components(chain, max_iter=15).collect()
    assert {r["cluster_id"] for r in labels} == {0}


def test_multimodal_null_payload_yields_null_rows_not_crash(spark):
    """A NULL payload must produce NULL output rows (decode/resize/
    audio) or no frames (sampler) — matching SQL NULL propagation —
    instead of len(None) aborting the Arrow batch."""
    from pyspark.sql import functions as F

    from venus_spark.operators.multimodal import (
        attach_payload,
        audio_features,
        decode_metadata,
        frame_sample,
        resize_images,
    )

    docs = attach_payload(
        spark.createDataFrame(
            [(0, "real content here"), (1, None)], "doc_id long, text string"
        )
    )
    dec = {r["doc_id"]: r for r in decode_metadata(docs).collect()}
    assert dec[1]["byte_len"] is None and dec[0]["byte_len"] > 0
    rs = {r["doc_id"]: r for r in resize_images(docs).collect()}
    assert rs[1]["dst_w"] is None and rs[0]["dst_w"] > 0
    au = {r["doc_id"]: r for r in audio_features(docs).collect()}
    assert au[1]["n_bytes"] is None and au[0]["n_bytes"] > 0
    fr = frame_sample(docs).groupBy("doc_id").count().collect()
    assert {r["doc_id"] for r in fr} == {0}


def _write_documents(spark, sf_dir, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")


def test_ewma_edges_single_point_and_null_hours(spark, tmp_path):
    """EWMA on degenerate series, cross-engine: a one-point series (ewma
    == the point), an hour whose only value is NULL (bucket vanishes on
    both sides), and a multi-hour series exercising the fold."""
    from venus_spark.plans.pipeline_behavioral import _EWMA_ORACLE, ewma_smoothing

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        (1, t("2024-01-01 10:10:00"), 1, "solo", 7.5, "{}"),
        (2, t("2024-01-01 10:00:00"), 1, "nullhole", None, "{}"),  # drops
        (3, t("2024-01-01 11:00:00"), 1, "nullhole", 2.0, "{}"),
        (4, t("2024-01-01 10:00:00"), 1, "multi", 1.0, "{}"),
        (5, t("2024-01-01 11:00:00"), 1, "multi", 10.0, "{}"),
        (6, t("2024-01-01 12:00:00"), 1, "multi", 100.0, "{}"),
        (7, t("2024-01-01 12:30:00"), 1, "multi", None, "{}"),  # ignored
    ]
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir, rows)
    r = compare(
        "ewma_edges",
        ewma_smoothing(spark, sf_dir),
        duckdb_connect(sf_dir),
        _EWMA_ORACLE,
    )
    assert r, r.detail
    got = {
        (x.event_type, x.hour): x.ewma
        for x in ewma_smoothing(spark, sf_dir).collect()
    }
    assert got[("solo", "2024-01-01 10:00:00")] == 7.5
    assert ("nullhole", "2024-01-01 10:00:00") not in got  # all-NULL hour
    assert got[("multi", "2024-01-01 11:00:00")] == round(0.3 * 10 + 0.7 * 1, 6)


def test_hash_embed_edges_empty_and_whitespace_docs(spark, tmp_path):
    """Feature hashing on degenerate docs, cross-engine: empty text and
    whitespace-only text produce NO rows (no tokens), a one-token doc
    produces exactly one unit-weight bucket."""
    from venus_spark.plans.pipeline_ann_exact import _embed_oracle, text_hash_embed

    rows = [
        (0, "", "en", "web", 0),
        (1, " \t\n ", "en", "web", 4),
        (2, "solitary", "en", "web", 8),
        (3, "a few real tokens here", "en", "web", 22),
    ]
    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, rows)
    r = compare(
        "hash_embed_edges",
        text_hash_embed(spark, sf_dir),
        duckdb_connect(sf_dir),
        _embed_oracle(),
    )
    assert r, r.detail
    got = text_hash_embed(spark, sf_dir).collect()
    by_doc = {}
    for x in got:
        by_doc.setdefault(x.doc_id, []).append(x)
    assert 0 not in by_doc and 1 not in by_doc
    assert len(by_doc[2]) == 1 and abs(abs(by_doc[2][0].w) - 1.0) < 1e-9


def test_containment_edges_short_docs_and_exact_dup(spark, tmp_path, monkeypatch):
    """Containment on degenerate docs, cross-engine: sub-shingle-length
    docs (single whole-text shingle), an exact duplicate pair (both
    directions at 1.0), and a cross-bucket pair that must NOT pair."""
    from venus_spark import prepared
    from venus_spark.plans.pipeline_dedup import _CONTAIN_ORACLE, dedup_containment

    # the plan builds the MinHash index for this tmp sf_dir — keep it
    # out of the repo-level .prepared cache
    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))

    long_a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    rows = [
        (0, long_a, "en", "web", len(long_a)),
        (1, long_a, "en", "web", len(long_a)),          # exact dup of 0
        (2, "tiny doc", "en", "web", 8),                # whole-text shingle
        (3, long_a, "de", "web", len(long_a)),          # other bucket
    ]
    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, rows)
    r = compare(
        "containment_edges",
        dedup_containment(spark, sf_dir),
        duckdb_connect(sf_dir),
        _CONTAIN_ORACLE,
    )
    assert r, r.detail
    got = sorted(
        (x.id_a, x.id_b, x.containment)
        for x in dedup_containment(spark, sf_dir).collect()
    )
    assert got == [(0, 1, 1.0), (1, 0, 1.0)]


def test_series_correlation_constant_series_yields_null(spark, tmp_path):
    """A constant series with values whose square quantizes DOWN at
    decimal(25,6) (v=0.0015: v*v = 0.00000225 -> 0.000002) pushes the
    variance term negative; unguarded, DuckDB SQRT raises Out of Range
    while Spark returns NaN. The clamp must make BOTH engines yield
    NULL pearson_r, and the oracle must run without error."""
    from venus_spark.plans.analytics_ext4 import (
        _CORR_SERIES_ORACLE,
        series_correlation,
    )

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = []
    eid = 0
    for hh in (10, 11, 12):
        for etype, val in (("flat", 0.0015), ("moving", float(hh))):
            rows.append((eid, t(f"2024-01-01 {hh}:00:00"), 1, etype, val, "{}"))
            eid += 1
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir, rows)
    r = compare(
        "corr_constant_edge",
        series_correlation(spark, sf_dir),
        duckdb_connect(sf_dir),
        _CORR_SERIES_ORACLE,
    )
    assert r, r.detail
    got = {
        (x.type_a, x.type_b): x.pearson_r
        for x in series_correlation(spark, sf_dir).collect()
    }
    assert got[("flat", "moving")] is None  # zero-variance side -> NULL


def test_drift_tv_bin_counts_merge_across_micro_batches(spark):
    """distribution_drift_tv's docstring claims histogram counts are
    the mergeable partial: computing (type, bin, period) counts over
    arbitrary micro-batch slices and SUMMING them must reproduce the
    one-shot plan exactly — the property that lets the same statistic
    be maintained per streaming micro-batch or per appended chunk."""
    from pyspark.sql import functions as F

    from venus_spark.plans.pipeline_eval import (
        _DRIFT_BIN_W,
        _DRIFT_CUT_US,
        _DRIFT_TV,
        distribution_drift_tv,
    )
    from venus_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    want = {
        r["event_type"]: (r["n_a"], r["n_b"], r["n_bins"], r["tv_drift"])
        for r in distribution_drift_tv(spark, sf).collect()
    }

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.floor(F.col("value") / F.expr(_DRIFT_BIN_W)).cast("integer").alias("bin"),
        (F.unix_micros(F.col("ts").cast("timestamp")) < F.lit(_DRIFT_CUT_US)).alias(
            "in_a"
        ),
        (F.col("event_id") % 3).alias("slice"),  # 3 arbitrary micro-batches
    )
    # per-micro-batch partials, then merged by summation
    partials = ev.groupBy("slice", "event_type", "bin").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("c_b"),
    )
    bins = partials.groupBy("event_type", "bin").agg(
        F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b")
    )
    totals = bins.groupBy("event_type").agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count("*").alias("n_bins"),
    )
    num = (
        bins.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
            ).alias("num")
        )
    )
    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["n_bins"], r["tv_drift"])
        for r in num.join(totals, "event_type")
        .select("event_type", "n_a", "n_b", "n_bins", F.expr(_DRIFT_TV).alias("tv_drift"))
        .collect()
    }
    assert got == want


def test_er_mask_blocking_is_complete_vs_brute_force(spark):
    """Deletion-neighborhood blocking must be EXACT for the fixed-format
    names: the per-position pair counts from the plan sum to the count
    the quadratic all-pairs levenshtein-distance-1 check finds (the
    completeness property that makes mask blocking a sound substitute
    for the all-pairs scan)."""
    import duckdb

    from venus_spark.plans.pipeline_dedup_scale import er_hamming_pairs

    sf = "/root/testdata/sf0.001"
    got = sum(
        r["n_pairs"] for r in er_hamming_pairs(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'"
    )
    want = con.execute(
        """
        SELECT COUNT(*) FROM customer a JOIN customer b
          ON a.c_custkey < b.c_custkey
        WHERE LEVENSHTEIN(a.c_name, b.c_name) = 1
        """
    ).fetchone()[0]
    assert got == want and got > 0


def test_dedup_incremental_agrees_with_corpus_self_dedup(spark):
    """The incremental new-vs-corpus result must be exactly the subset
    of the corpus-wide self-dedup pairs that cross the batch split —
    same bands, same threshold, no pair invented or lost by the
    cross-set join."""
    from venus_spark.plans.pipeline_dedup import dedup_minhash_lsh
    from venus_spark.plans.pipeline_dedup_scale import _INC_MOD, dedup_incremental

    sf = "/root/testdata/sf0.001"
    inc = {
        (r["new_doc"], r["dup_doc"])
        for r in dedup_incremental(spark, sf).collect()
    }
    full = {
        (r["id_a"], r["id_b"], r["jaccard_sim"])
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    want = set()
    for id_a, id_b, _j in full:
        a_new, b_new = id_a % _INC_MOD == 0, id_b % _INC_MOD == 0
        if a_new and not b_new:
            want.add((id_a, id_b))
        elif b_new and not a_new:
            want.add((id_b, id_a))
    assert inc == want and len(inc) > 0


def test_drift_tv_one_sided_type_is_total_drift_not_nan(spark, tmp_path):
    """A type present in only one period must report tv_drift = 1.0
    (total mass moved), not the 0/0 NaN the unguarded ratio degenerates
    to — and the oracle must agree on the same synthetic table."""
    import datetime as dt

    from venus_spark.plans import all_plans

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # 'early' exists only before the cut (2024-01-16)
        (1, t("2024-01-02 10:00:00"), 1, "early", 5.0, "{}"),
        (2, t("2024-01-03 10:00:00"), 2, "early", 30.0, "{}"),
        # 'late' exists only after
        (3, t("2024-01-20 10:00:00"), 3, "late", 7.0, "{}"),
        # 'both' spans the cut with identical histograms -> tv 0
        (4, t("2024-01-02 09:00:00"), 4, "both", 10.0, "{}"),
        (5, t("2024-01-20 09:00:00"), 5, "both", 10.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir, rows)

    p = all_plans()["distribution_drift_tv"]
    got = {r["event_type"]: r for r in p.fn(spark, sf_dir).collect()}
    assert got["early"]["tv_drift"] == 1.0 and got["early"]["n_b"] == 0
    assert got["late"]["tv_drift"] == 1.0 and got["late"]["n_a"] == 0
    assert got["both"]["tv_drift"] == 0.0

    con = duckdb_connect(sf_dir)
    res = compare("drift_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail


def test_trend_degenerate_series_yield_null_not_error(spark, tmp_path):
    """value_trend_per_type's CASE guards: a type whose events share
    ONE timestamp has sxx = 0 (slope/intercept/r2 NULL, no division
    error under ANSI), and a type with constant value has syy = 0
    (r2 NULL, slope 0) — oracle-matched on the same synthetic table."""
    import datetime as dt

    from venus_spark.plans import all_plans

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # one shared timestamp -> sxx = 0
        (1, t("2024-01-05 10:00:00"), 1, "same_ts", 1.0, "{}"),
        (2, t("2024-01-05 10:00:00"), 2, "same_ts", 9.0, "{}"),
        # constant value over time -> syy = 0, slope 0
        (3, t("2024-01-02 10:00:00"), 3, "flat", 4.0, "{}"),
        (4, t("2024-01-09 10:00:00"), 4, "flat", 4.0, "{}"),
        # a real trend for contrast: value doubles in 7 days
        (5, t("2024-01-02 10:00:00"), 5, "rise", 2.0, "{}"),
        (6, t("2024-01-09 10:00:00"), 6, "rise", 4.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    _write_events(spark, sf_dir, rows)

    p = all_plans()["value_trend_per_type"]
    got = {r["event_type"]: r for r in p.fn(spark, sf_dir).collect()}
    assert got["same_ts"]["slope_per_day"] is None
    assert got["same_ts"]["r2"] is None
    assert got["flat"]["slope_per_day"] == 0.0 and got["flat"]["r2"] is None
    assert abs(got["rise"]["slope_per_day"] - 2.0 / 7.0) < 1e-6
    assert got["rise"]["r2"] == 1.0

    con = duckdb_connect(sf_dir)
    res = compare("trend_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail


def _write_docs(spark, sf_dir, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")


def test_phrase_search_counts_repeats_and_ignores_reversals(
    spark, tmp_path, monkeypatch
):
    """Positional-phrase edges on a synthetic corpus: a doc repeating
    the phrase counts every occurrence, the reversed word order does
    NOT match, a doc containing only one term does not match, and the
    oracle agrees."""
    from venus_spark import prepared
    from venus_spark.plans import all_plans

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    rows = [
        (1, "part filter part filter", "en", "a", 23),  # 2 occurrences
        (2, "filter part", "en", "a", 11),  # reversed: no match
        (3, "part alone here", "en", "a", 15),  # one term only
        (4, "a part filter b", "en", "a", 15),  # 1 occurrence
        (5, "nothing relevant", "en", "a", 16),
        # proximity corpus (_PROX_TERMS = hash/join, slop 3):
        (6, "join x hash", "en", "a", 11),  # reversed, distance 2: match
        (7, "hash a b c d join", "en", "a", 17),  # distance 5: no match
    ]
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, rows)

    p = all_plans()["phrase_search_prepared"]
    got = {r["doc_id"]: r["n_occurrences"] for r in p.fn(spark, sf_dir).collect()}
    assert got == {1: 2, 4: 1}

    con = duckdb_connect(sf_dir)
    res = compare("phrase_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail

    # proximity (slop 3) admits the reversed order but not distance > 3
    px = all_plans()["proximity_search_prepared"]
    got_p = {r["doc_id"]: r["n_near"] for r in px.fn(spark, sf_dir).collect()}
    assert got_p == {6: 1}
    res = compare("prox_edge", px.fn(spark, sf_dir), con, px.oracle)
    assert res.ok, res.detail


def test_winnowing_shared_run_guarantee_and_edges(spark, tmp_path):
    """Winnowing's covenant: two documents sharing a token run of at
    least w+k-1 (= 8) tokens share at least one selected fingerprint;
    degenerate docs (under k tokens, zero tokens, exactly one window)
    digest without error and match the oracle bit-for-bit. The
    guarantee is checked on the PRODUCTION kernel
    (pipeline_decontam.winnow_fingerprints), not a reimplementation."""
    from venus_spark.plans import all_plans
    from venus_spark.plans.pipeline_decontam import winnow_fingerprints
    from venus_spark.sources import load_table

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro words here {shared} tail one", "en", "a", 60),
        (2, f"{shared} completely different ending path", "en", "a", 60),
        (3, "tiny doc", "en", "a", 8),          # < k tokens: no grams
        (4, "", "en", "a", 0),                   # zero tokens
        (5, "one two three four", "en", "a", 18),  # exactly one k-gram
    ]
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, rows)

    p = all_plans()["winnowing_fingerprints"]
    got = {r["doc_id"]: r.asDict() for r in p.fn(spark, sf_dir).collect()}
    assert got[3]["n_grams"] == 0 and got[3]["fp_checksum"] == 0
    assert got[4]["n_grams"] == 0 and got[4]["n_selected"] == 0
    assert got[5]["n_grams"] == 1 and got[5]["n_selected"] == 1

    con = duckdb_connect(sf_dir)
    res = compare("winnow_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail

    fps = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_fingerprints(load_table(spark, sf_dir, "documents")).collect()
    }
    assert fps[1] & fps[2], "8-token shared run must share a fingerprint"


def test_ndcg_drops_below_one_when_bm25_misorders_grades(spark, tmp_path, monkeypatch):
    """The discriminating half of retrieval_eval_ndcg: a short document
    stuffed with ONE query term outscores (BM25) a long document that
    matches BOTH terms, so the system ordering is not the ideal
    ordering and ndcg < 1 for that query — while dcg/idcg/ndcg still
    match the oracle bit-for-bit."""
    from venus_spark.plans import all_plans

    filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        # query 1 = (vector, stream): the 1-term spam doc wins on tf/dl
        (1, "vector vector vector vector vector", "en", "a", 35),
        (2, f"vector stream {filler}", "en", "a", 200),
        (3, f"stream {filler}", "en", "a", 180),
        # query 2 = (hash, join) and 3 = (big, order): normal docs
        (4, "hash join big order", "en", "a", 19),
        (5, f"hash join {filler}", "en", "a", 150),
        (6, f"big order {filler}", "en", "a", 150),
        (7, filler, "en", "a", 170),
    ]
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, rows)
    import venus_spark.prepared as prepared

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    p = all_plans()["retrieval_eval_ndcg"]
    got = {r["query_id"]: r.asDict() for r in p.fn(spark, sf_dir).collect()}
    assert got[1]["ndcg"] is not None and got[1]["ndcg"] < 1.0
    con = duckdb_connect(sf_dir)
    res = compare("ndcg_edge", p.fn(spark, sf_dir), con, p.oracle)
    assert res.ok, res.detail


def test_exact_dedup_positive_path_cross_engine(spark, tmp_path):
    """VERDICT r8 #2: the synthetic corpus holds no byte-identical
    duplicates, so dedup_exact's green oracle rows were vacuous (empty
    vs empty — no-false-positives only). Plant REAL duplicates and pin
    the positive path cross-engine: groups found, n_copies exact,
    keeper = min doc_id, whitespace/case canonicalization applied, and
    the oracle comparison non-vacuous (≥ 1 row) — the field-fidelity
    oracle style of the reference's test_sender superset assertions
    (/root/reference/tests/test_sender.py:97-136)."""
    from venus_spark.plans.pipeline_dedup import _DEDUP_EXACT_ORACLE, dedup_exact

    rows = [
        # trio of byte-identical texts -> one group, keeper 1
        (1, "the quick brown fox", "en", "web", 19),
        (5, "the quick brown fox", "en", "web", 19),
        (9, "the quick brown fox", "en", "cc", 19),
        # canonicalization pair: case + whitespace collapse + trim
        (2, "Hello   World ", "en", "web", 14),
        (7, "hello world", "en", "web", 11),
        # singletons: never reported
        (3, "unique text one", "en", "web", 15),
        (4, "unique text two", "en", "web", 15),
    ]
    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, rows)
    r = compare(
        "dedup_exact_positive",
        dedup_exact(spark, sf_dir),
        duckdb_connect(sf_dir),
        _DEDUP_EXACT_ORACLE,
    )
    assert r, r.detail
    got = {
        r["keep_id"]: r["n_copies"]
        for r in dedup_exact(spark, sf_dir).collect()
    }
    assert got == {1: 3, 2: 2}, got  # non-vacuous, keeper = min id


def test_mm_payload_dedup_positive_path_cross_engine(spark, tmp_path):
    """The binary-payload twin of the exact-dedup positive path: RAW
    byte hashing (no text canonicalization — 'Hello' and 'hello' are
    DIFFERENT payloads), duplicate groups found with keeper = min
    doc_id, cross-engine agreement non-vacuous."""
    from venus_spark.plans.pipeline_multimodal import _MM_DEDUP_ORACLE, mm_payload_dedup

    rows = [
        (1, "same payload bytes", "en", "web", 18),
        (6, "same payload bytes", "en", "cc", 18),
        (8, "same payload bytes", "en", "web", 18),
        # near-miss: differs only by case -> NOT a payload duplicate
        (2, "Same payload bytes", "en", "web", 18),
        (3, "other bytes", "en", "web", 11),
        (4, "other bytes", "en", "web", 11),
    ]
    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, rows)
    r = compare(
        "mm_payload_dedup_positive",
        mm_payload_dedup(spark, sf_dir),
        duckdb_connect(sf_dir),
        _MM_DEDUP_ORACLE,
    )
    assert r, r.detail
    got = {
        r["keeper_doc"]: r["n_payloads"]
        for r in mm_payload_dedup(spark, sf_dir).collect()
    }
    assert got == {1: 3, 3: 2}, got
    # case-variant payload stayed out of group 1 (raw bytes, no
    # canonicalization — deliberately different from doc_fingerprint)
    assert 2 not in got
