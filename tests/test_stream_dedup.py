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
