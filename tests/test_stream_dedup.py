"""Streaming duplicate suppression (dedup_stream): a sender retry or
upstream replay re-delivers records; the stream drops re-deliveries
inside the watermark horizon (the reference's at-least-once tail,
venus/db/write.py:80-84, made exact within the horizon)."""

from __future__ import annotations

import json

from tests.test_ingest import make_record
from venus_spark.ingest import good_records, parse_records
from venus_spark.streaming import dedup_stream, read_log_stream


def test_dedup_stream_drops_redelivered_records(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    originals = [make_record(i) for i in range(5)]
    # File a: the originals. File b: a full re-delivery (identical lines,
    # the retry-whole-batch failure mode) plus one genuinely new record.
    (landing / "a.jsonl").write_text("\n".join(json.dumps(r) for r in originals))
    (landing / "b.jsonl").write_text(
        "\n".join([*(json.dumps(r) for r in originals), json.dumps(make_record(5))])
    )

    # max_files_per_trigger=1 -> the re-delivery arrives in a LATER
    # micro-batch than the original (whichever file lands first — the
    # file-source pickup order between equal-mtime files is
    # nondeterministic, but both orders contain the same lines), so this
    # exercises cross-batch dedup state, not just within-batch distinct.
    src = read_log_stream(spark, str(landing), max_files_per_trigger=1)
    good = good_records(parse_records(src))
    dd = dedup_stream(good, key_cols=("message",), event_time_col="time")
    q = (
        dd.writeStream.format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = [r["message"] for r in spark.sql("SELECT message FROM dd_out").collect()]
    assert sorted(got) == [f"work {i}" for i in range(6)]  # one row per key, none lost


def test_streaming_near_dup_screen_at_ingest(spark, tmp_path, monkeypatch):
    """Dedup-at-ingest end-to-end: with screen_near_dups=True every
    documents micro-batch is screened against the LIVE MinHash index
    (base ∪ earlier batches' pending) BEFORE it lands, and the verdicts
    land exactly-once in the dup_verdicts side table. Two sequential
    availableNow runs force two distinct micro-batches, so the second
    batch must see the first batch's documents as corpus — the verdict
    log must equal the batch-side incremental_near_dups computation
    stage by stage, and a checkpoint-complete rerun adds nothing."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from venus_spark import prepared
    from venus_spark.operators.dedup import incremental_near_dups
    from venus_spark.streaming import read_sink_table, start_documents_ingest

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))

    # corpus = doc_id % 3 != 0 (same split the dedup_incremental plan
    # uses, so the crossing near-dup population is known non-empty)
    sf = str(tmp_path / "sf")
    docs.filter(F.col("doc_id") % 3 != 0).write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    base_idx = prepared.documents_minhash(spark, sf)

    new_rows = [
        r.asDict() for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
    ]
    half = len(new_rows) // 2
    chunks = (new_rows[:half], new_rows[half:])

    landing = tmp_path / "landing"
    landing.mkdir()

    def run():
        q = start_documents_ingest(
            spark.readStream.schema(docs.schema).json(str(landing)),
            sink_dir=str(tmp_path / "sink"),
            checkpoint_dir=str(tmp_path / "ck"),
            index_sf_dir=sf,
            trigger_seconds=None,
            screen_near_dups=True,
        )
        q.awaitTermination()

    # land + run one chunk at a time: two separate micro-batches
    for i, chunk in enumerate(chunks):
        (landing / f"batch{i}.json").write_text(
            "\n".join(_json.dumps(r) for r in chunk) + "\n"
        )
        run()

    b0_idx = prepared._minhash_rows(spark.createDataFrame(chunks[0], docs.schema))
    b1_idx = prepared._minhash_rows(spark.createDataFrame(chunks[1], docs.schema))
    exp = {
        (r["new_doc"], r["dup_doc"], r["jaccard_sim"])
        for r in incremental_near_dups(b0_idx, base_idx).collect()
    } | {
        (r["new_doc"], r["dup_doc"], r["jaccard_sim"])
        for r in incremental_near_dups(
            b1_idx, base_idx.unionByName(b0_idx)
        ).collect()
    }
    assert len(exp) > 0

    def verdict_rows():
        return [
            (r["new_doc"], r["dup_doc"], r["jaccard_sim"])
            for r in read_sink_table(
                spark, str(tmp_path / "sink"), "dup_verdicts"
            ).collect()
        ]

    got = verdict_rows()
    assert len(got) == len(set(got))  # exactly-once: no duplicate verdicts
    assert set(got) == exp

    # completed-checkpoint rerun: nothing reprocesses, nothing duplicates
    run()
    assert sorted(verdict_rows()) == sorted(got)


def test_screen_replay_never_self_matches(spark, tmp_path, monkeypatch):
    """Review r5 finding: a crash-replayed batch already has its own
    rows in the pending area, so without the corpus-side exclusion the
    re-screen would flag every replayed document as a duplicate of
    itself (jaccard 1.0). Simulated by re-running the stream with a
    FRESH checkpoint (a full replay of all files) over the already-
    populated pending area — the verdict log must be unchanged and
    contain no self-pairs."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from venus_spark import prepared
    from venus_spark.streaming import read_sink_table, start_documents_ingest

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    sf = str(tmp_path / "sf")
    docs.filter(F.col("doc_id") % 3 != 0).write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    prepared.documents_minhash(spark, sf)

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [r.asDict() for r in docs.filter(F.col("doc_id") % 3 == 0).collect()]
    (landing / "batch0.json").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n"
    )

    def run(ck):
        q = start_documents_ingest(
            spark.readStream.schema(docs.schema).json(str(landing)),
            sink_dir=str(tmp_path / "sink"),
            checkpoint_dir=str(tmp_path / ck),
            index_sf_dir=sf,
            trigger_seconds=None,
            screen_near_dups=True,
        )
        q.awaitTermination()

    run("ck1")
    first = sorted(
        (r["new_doc"], r["dup_doc"], r["jaccard_sim"])
        for r in read_sink_table(spark, str(tmp_path / "sink"), "dup_verdicts").collect()
    )
    assert first  # the %3 split has crossing near-dups at sf0.001

    # full replay: fresh checkpoint, pending partition already landed
    run("ck2")
    replayed = sorted(
        (r["new_doc"], r["dup_doc"], r["jaccard_sim"])
        for r in read_sink_table(spark, str(tmp_path / "sink"), "dup_verdicts").collect()
    )
    assert replayed == first
    assert all(n != d for n, d, _ in replayed)  # no self-pairs, ever


def test_screen_with_no_duplicates_writes_no_verdict_files(spark, tmp_path, monkeypatch):
    """Review r5 finding: an empty dynamic-overwrite parquet write
    lands no data files and leaves an uninferrable directory. A batch
    with zero near-dups must therefore write nothing at all — the
    verdict table materializes on the first actual duplicate."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from venus_spark import prepared
    from venus_spark.streaming import start_documents_ingest

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    sf = str(tmp_path / "sf")
    docs.filter(F.col("doc_id") < 50).write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    prepared.documents_minhash(spark, sf)

    landing = tmp_path / "landing"
    landing.mkdir()
    # unique texts that cannot reach 0.8 shingle jaccard with anything
    rows = [
        {"doc_id": 9000 + i, "text": f"zq{i} wv{i} xr{i} yt{i} uk{i} pj{i}",
         "lang": "xx", "source": "synthetic", "n_chars": 30}
        for i in range(3)
    ]
    (landing / "b.json").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    q = start_documents_ingest(
        spark.readStream.schema(docs.schema).json(str(landing)),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ck"),
        index_sf_dir=sf,
        trigger_seconds=None,
        screen_near_dups=True,
    )
    q.awaitTermination()

    vdir = tmp_path / "sink" / "dup_verdicts"
    if vdir.exists():  # nothing parquet-readable may exist
        data = [p for p in vdir.rglob("*.parquet")]
        assert not data
    # the documents themselves still landed and were indexed
    assert (tmp_path / "sink" / "documents").exists()
    live_ids = {
        r["doc_id"]
        for r in prepared.documents_minhash_live(spark, sf).select("doc_id").collect()
    }
    assert {9000, 9001, 9002} <= live_ids
