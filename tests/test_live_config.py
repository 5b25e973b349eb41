"""Live config reload (A14 analog, reference venus/settings.py:44-127):
file-watcher semantics, error posture, and per-micro-batch application
of drop_fields in the streaming ingest path."""

from __future__ import annotations

import json
import logging
import time

import pytest

from venus_spark.live_config import LiveConfig


def write_cfg(path, data):
    path.write_text(json.dumps(data))


def fresh(path, **kw) -> LiveConfig:
    # refresh_seconds=0 -> every get() re-stats; tests stay time-free.
    return LiveConfig(str(path), refresh_seconds=0.0, **kw)


def test_get_reads_file_and_falls_back_to_defaults(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"drop_fields": ["thread"]})
    cfg = fresh(p, defaults={"max_batch_size": 100})
    assert cfg.get("drop_fields") == ["thread"]
    assert cfg.get("max_batch_size") == 100  # default survives file content
    assert cfg.get("absent", "x") == "x"


def test_change_is_picked_up_on_mtime_change(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"k": 1})
    cfg = fresh(p)
    assert cfg.get("k") == 1
    write_cfg(p, {"k": 2})
    assert cfg.get("k") == 2


def test_secret_values_masked_in_change_log(tmp_path, caplog):
    """Reference parity (settings.py:10,92-96 DO_NOT_PRINT): a changed
    config value whose key smells like a credential is logged first
    character only; non-secret values log verbatim."""
    p = tmp_path / "cfg.json"
    write_cfg(p, {"db_password": "hunter2", "max_batch_size": 50})
    cfg = fresh(p)
    with caplog.at_level(logging.INFO, logger="venus_spark.live_config"):
        assert cfg.get("db_password") == "hunter2"  # value itself unmasked
    joined = "\n".join(r.getMessage() for r in caplog.records)
    assert "hunter2" not in joined
    assert "hXXXXXX" in joined
    assert "50" in joined  # non-secret logged as-is


def test_malformed_json_keeps_last_good_config(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"k": 1})
    cfg = fresh(p)
    assert cfg.get("k") == 1
    p.write_text("{not json")
    assert cfg.get("k") == 1  # reference's catch-log-continue posture
    write_cfg(p, {"k": 3})
    assert cfg.get("k") == 3  # recovers once the file is valid again


def test_missing_file_keeps_last_good_and_recovers(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"k": 1})
    cfg = fresh(p)
    assert cfg.get("k") == 1
    p.unlink()
    assert cfg.get("k") == 1
    write_cfg(p, {"k": 2})
    assert cfg.get("k") == 2


def test_interval_throttles_reads(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"k": 1})
    cfg = LiveConfig(str(p), refresh_seconds=3600.0)
    assert cfg.get("k") == 1
    write_cfg(p, {"k": 2})
    assert cfg.get("k") == 1  # inside the interval: cached value served


def test_get_callable_is_late_bound(tmp_path):
    p = tmp_path / "cfg.json"
    write_cfg(p, {"max_batch_size": 100})
    cfg = fresh(p)
    reader = cfg.get_callable("max_batch_size", 5)
    assert reader() == 100
    write_cfg(p, {"max_batch_size": 250})
    assert reader() == 250  # same callable, new value — environ.get_callable analog


def test_apply_log_levels_with_root_alias(tmp_path):
    p = tmp_path / "cfg.json"
    name = "venus_spark._lcfg_test"
    write_cfg(p, {"log_levels": {name: "DEBUG", "root": "WARNING"}})
    cfg = fresh(p)
    cfg.apply_log_levels()
    assert logging.getLogger(name).level == logging.DEBUG
    assert logging.getLogger().level == logging.WARNING
    write_cfg(p, {"log_levels": {name: "ERROR"}})
    cfg.apply_log_levels()
    assert logging.getLogger(name).level == logging.ERROR


def test_streaming_ingest_applies_drop_fields_live(spark, tmp_path):
    """The A14 end-to-end: the SAME wiring (no code change, no new plan)
    prunes different payload fields after the config file changes —
    applied per micro-batch via foreachBatch. availableNow runs give two
    deterministic triggers; in processingTime mode the cadence is
    identical (the closure re-reads config every batch)."""
    from tests.test_ingest import make_record
    from venus_spark.streaming import read_log_stream, start_logs_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    cfgp = tmp_path / "cfg.json"
    write_cfg(cfgp, {"drop_fields": ["thread", "threadName"]})
    cfg = fresh(cfgp)
    kwargs = dict(
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=None,
        live_config=cfg,
    )

    (landing / "one.jsonl").write_text(json.dumps(make_record(1)))
    q = start_logs_ingest(read_log_stream(spark, str(landing)), **kwargs)
    q.awaitTermination(120)
    assert q.exception() is None

    logs_dir = str(tmp_path / "sink" / "logs")
    first = json.loads(
        spark.read.parquet(logs_dir).filter("message = 'work 1'").first()["data"]
    )
    # module survives (default DROP_FIELDS would have pruned it); thread pruned.
    assert "module" in first and "thread" not in first

    # Config change: from now on prune module/processName instead.
    write_cfg(cfgp, {"drop_fields": ["module", "processName", "created", "msecs"]})
    (landing / "two.jsonl").write_text(json.dumps(make_record(2)))
    q = start_logs_ingest(read_log_stream(spark, str(landing)), **kwargs)
    q.awaitTermination(120)
    assert q.exception() is None

    second = json.loads(
        spark.read.parquet(logs_dir).filter("message = 'work 2'").first()["data"]
    )
    assert "thread" in second and "module" not in second


def test_apply_log_levels_survives_malformed_config(tmp_path):
    """A config typo must be logged and skipped, never raised — this
    runs inside the ingest foreachBatch, where an exception fails the
    micro-batch and takes down the streaming query."""
    import json
    import logging

    from venus_spark.live_config import LiveConfig

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"log_levels": {
        "vs_test_logger": "debug",      # lowercase: must normalize, not crash
        "vs_other_logger": "NOT_A_LEVEL",  # unknown: must skip, not crash
    }}))
    cfg = LiveConfig(str(p), refresh_seconds=0)
    cfg.apply_log_levels()  # must not raise
    assert logging.getLogger("vs_test_logger").level == logging.DEBUG
    assert logging.getLogger("vs_other_logger").level == logging.NOTSET

    p.write_text(json.dumps({"log_levels": ["not", "a", "dict"]}))
    cfg.apply_log_levels()  # wrong shape: ignored, not raised
