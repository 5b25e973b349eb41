"""The ZMQ->landing relay's batching and landing semantics (no zmq or
Spark needed — the socket loop is import-gated edge code; what must be
right is the flush policy and the atomic landing protocol the streaming
file source depends on)."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "zmq_relay",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "zmq_relay.py"),
)
relay = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(relay)


def test_size_trigger_flushes_at_max(tmp_path):
    b = relay.MicroBatcher(str(tmp_path), max_size=3, max_age=999.0)
    assert b.add("a") is None
    assert b.add("b") is None
    path = b.add("c")
    assert path is not None and os.path.exists(path)
    assert open(path).read() == "a\nb\nc\n"
    assert b.buf == []


def test_age_trigger_uses_oldest_buffered_line(tmp_path):
    b = relay.MicroBatcher(str(tmp_path), max_size=100, max_age=5.0)
    b.add("x", now=1000.0)
    b.add("y", now=1004.9)
    assert not b.due(now=1004.9)  # age counts from the OLDEST line
    assert b.due(now=1005.0)
    path = b.flush()
    assert open(path).read() == "x\ny\n"


def test_no_partial_files_under_final_name(tmp_path):
    b = relay.MicroBatcher(str(tmp_path), max_size=2, max_age=999.0)
    b.add("1")
    # Buffered-but-unflushed rows must not be visible to the file source.
    assert os.listdir(tmp_path) == []
    b.add("2")
    names = os.listdir(tmp_path)
    assert len(names) == 1 and not names[0].startswith("._tmp-")


def test_sequence_and_restart_names_never_collide(tmp_path):
    b1 = relay.MicroBatcher(str(tmp_path), max_size=1, max_age=999.0)
    b1.add("a")
    b1.add("b")
    b2 = relay.MicroBatcher(str(tmp_path), max_size=1, max_age=999.0)  # restart: seq resets
    b2.add("c")
    assert len(os.listdir(tmp_path)) == 3  # uuid suffix keeps seq-0 files apart


def test_frame_to_line_drops_transport_level_and_keeps_payload():
    line = relay.frame_to_line(b"INFO", b'{"created": 1.5, "x": 1}\n')
    assert line == '{"created": 1.5, "x": 1}'


def test_stdin_mode_end_to_end(tmp_path):
    landing = tmp_path / "landing"
    lines = [f'{{"i": {i}}}' for i in range(7)]
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "zmq_relay.py")
    subprocess.run(
        [sys.executable, script, "--landing", str(landing), "--stdin", "--batch-size", "3"],
        input="\n".join(lines) + "\n",
        text=True,
        check=True,
        timeout=60,
    )
    files = sorted(landing.iterdir())
    assert len(files) == 3  # 3 + 3 + EOF-flush of 1
    landed = [ln for f in files for ln in f.read_text().splitlines()]
    assert landed == lines


def test_zmq_mode_without_pyzmq_exits_with_guidance(tmp_path):
    if importlib.util.find_spec("zmq") is not None:
        pytest.skip("pyzmq installed; the import gate is not reachable")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "zmq_relay.py")
    proc = subprocess.run(
        [sys.executable, script, "--landing", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode != 0
    assert "--stdin" in proc.stderr


def test_relay_to_ingest_to_query_end_to_end(spark, tmp_path):
    """The full reference topology in ONE test (reference
    tests/test_sender.py:61 asserts logged ⊇ sent over the same path):
    sender lines -> relay micro-batcher (subprocess; stdin drives the
    identical batch/land code the ZMQ PULL loop feeds — pyzmq is absent
    in this container) -> landing dir -> start_logs_ingest -> logs
    table -> correlation-id point query. Round 3 tested relay and
    ingest separately; this closes the seam between them."""
    import json
    import uuid

    import test_ingest as ti
    from venus_spark.streaming import (
        read_log_stream,
        read_sink_table,
        start_logs_ingest,
    )

    landing = tmp_path / "landing"
    corr = str(uuid.uuid4())
    sent_msgs = set()
    lines = []
    for i in range(25):
        rec = ti.make_record(i, corr=corr if i == 7 else None)
        rec["message"] = f"sent-{uuid.uuid4()}"
        sent_msgs.add(rec["message"])
        lines.append(json.dumps(rec))
    lines.append("{torn frame, not json")  # must quarantine, not crash

    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "zmq_relay.py")
    subprocess.run(
        [sys.executable, script, "--landing", str(landing), "--stdin",
         "--batch-size", "10"],
        input="\n".join(lines) + "\n",
        text=True,
        check=True,
        timeout=60,
    )
    assert len(list(landing.iterdir())) == 3  # 10 + 10 + EOF flush of 6

    sink = tmp_path / "sink"
    q = start_logs_ingest(
        read_log_stream(spark, str(landing)),
        sink_dir=str(sink),
        checkpoint_dir=str(tmp_path / "ck"),
        trigger_seconds=None,  # availableNow: drain and stop
    )
    q.awaitTermination()

    logs = read_sink_table(spark, str(sink), "logs")
    logged = {r["message"] for r in logs.select("message").collect()}
    assert logged.issuperset(sent_msgs)  # the reference's core assertion
    # the quarantine caught the torn frame instead of dropping the batch
    quarantine = read_sink_table(spark, str(sink), "quarantine")
    assert quarantine.count() == 1
    # and the landed table serves the reference's primary query pattern
    hits = logs.filter(logs.correlation_id == corr).collect()
    assert len(hits) == 1 and hits[0]["message"].startswith("sent-")


def test_due_handles_monotonic_zero():
    # `oldest or now` misread clock value 0.0 as unset, so a batch
    # whose first line arrived at t=0 never aged out
    b = relay.MicroBatcher("/tmp/unused", max_size=100, max_age=5.0)
    b.add("x", now=0.0)
    assert not b.due(now=4.9)
    assert b.due(now=5.0)


def test_stdin_mode_preserves_non_utf8_bytes(tmp_path):
    """A non-UTF8 byte on stdin must ride through surrogateescape into
    the landing file (downstream quarantine decides), not kill the
    relay with UnicodeDecodeError and lose the buffered batch."""
    landing = tmp_path / "landing"
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "zmq_relay.py")
    proc = subprocess.run(
        [sys.executable, script, "--landing", str(landing), "--stdin",
         "--batch-size", "10"],
        input=b'{"ok": 1}\n\xff{torn\n{"ok": 2}\n',
        check=True,
        timeout=60,
    )
    assert proc.returncode == 0
    files = sorted(landing.iterdir())
    assert len(files) == 1  # EOF flush of all three lines
    raw = files[0].read_bytes()
    assert b'{"ok": 1}' in raw and b'{"ok": 2}' in raw
    assert b"{torn" in raw  # the bad line survived for quarantine
