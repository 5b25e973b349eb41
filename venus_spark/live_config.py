"""Live config reload — the A14 analog (reference
``venus/settings.py:44-127``).

The reference runs a background task that polls a Consul KV path every
``UPDATE_ENV_VAR_INTERVAL_SECONDS``, overwrites changed env vars (every
setting is read through ``environ.get_callable`` so the *next use* sees
the new value), and applies logger-level changes; errors are logged and
the poll continues. The Spark-native translation keeps every one of
those semantics but swaps the KV store for a watched JSON file — the
artifact a config service (Consul-template, a ConfigMap mount, an
object-store object) materializes next to the job; polling infra
belongs to the deployment, not the engine:

- **get_callable** → :meth:`LiveConfig.get_callable`; the streaming
  sink reads ``drop_fields`` through it *per micro-batch* inside
  ``foreachBatch``, so a change lands at the next trigger with no query
  restart — the same granularity as the reference, whose batcher reads
  ``MAX_BATCH_SIZE()`` per flush (``venus/main.py:30-36``).
- **logger levels** → :meth:`LiveConfig.apply_log_levels`, same
  root-alias and skip-if-unchanged behavior
  (``venus/settings.py:105-127``).
- **error posture** → malformed JSON or a vanished file keeps the last
  good config and keeps polling (``venus/settings.py:66-69``).

Reads are mtime-gated and interval-throttled: steady state costs one
``os.stat`` per interval, nothing per row, and the config never touches
the executors — it only shapes the plan the driver builds for the next
micro-batch.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time

logger = logging.getLogger(__name__)

DEFAULT_REFRESH_SECONDS = 2.0  # reference UPDATE_ENV_VAR_INTERVAL_SECONDS analog

# Secret-bearing keys are masked in change logs, first character kept —
# the reference's DO_NOT_PRINT password protection
# (/root/reference/venus/settings.py:10,92-96).
DO_NOT_PRINT = {"password", "pass", "pw"}


def _printable(key: str, value) -> object:
    """Mask a secret-looking value for the change log: first character
    plus one X per remaining character, matching the reference's
    masking shape. Non-string secrets mask via their str form."""
    if not any(s in key.lower() for s in DO_NOT_PRINT):
        return value
    s = str(value)
    return (s[0] + "X" * len(s[1:])) if s else s


class LiveConfig:
    """A JSON file re-read at most every ``refresh_seconds``, exposing
    point-in-time reads (:meth:`get`) and late-bound reads
    (:meth:`get_callable` — the ``environ.get_callable`` analog)."""

    def __init__(
        self,
        path: str,
        refresh_seconds: float = DEFAULT_REFRESH_SECONDS,
        defaults: dict | None = None,
    ) -> None:
        self._path = path
        self._refresh_seconds = refresh_seconds
        self._defaults = dict(defaults or {})
        self._lock = threading.Lock()
        self._data: dict = {}
        self._mtime_ns: int | None = None
        self._next_check = 0.0  # monotonic deadline; first get() always reads
        self._applied_levels: dict[str, str] = {}

    def _refresh_locked(self) -> None:
        now = time.monotonic()
        if now < self._next_check:
            return
        self._next_check = now + self._refresh_seconds
        try:
            st = os.stat(self._path)
        except OSError:
            # File gone (config service mid-swap): keep last good config,
            # keep polling — the reference's catch-log-continue posture.
            self._mtime_ns = None
            return
        if st.st_mtime_ns == self._mtime_ns:
            return
        try:
            with open(self._path, encoding="utf-8") as fh:
                data = json.load(fh)
            if not isinstance(data, dict):
                raise ValueError(f"config root must be an object, got {type(data)}")
        except (OSError, ValueError) as exc:
            logger.exception("live-config: problem reading %s: %s", self._path, exc)
            return  # keep last good config; retry next interval
        self._mtime_ns = st.st_mtime_ns
        for k, v in data.items():
            if k not in self._data or self._data[k] != v:
                logger.info("live-config: %r changed, now %r", k, _printable(k, v))
        self._data = data

    def get(self, key: str, default=None):
        with self._lock:
            self._refresh_locked()
            if key in self._data:
                return self._data[key]
            return self._defaults.get(key, default)

    def get_callable(self, key: str, default=None):
        """Late-bound read — call at use time, like the reference's
        ``environ.get_callable`` settings."""
        return lambda: self.get(key, default)

    def apply_log_levels(self, key: str = "log_levels") -> None:
        """Apply ``{logger_name: level}`` from config; ``root`` aliases
        the root logger; unchanged levels are skipped (reference
        ``load_new_logger_levels``). A malformed entry — wrong value
        shape, unknown or lowercase level name — is logged and SKIPPED,
        never raised: this runs inside the ingest ``foreachBatch``, so
        an exception here would fail the micro-batch and take down the
        streaming query over a config typo (the module contract is
        keep-last-good, not crash)."""
        levels = self.get(key, {}) or {}
        if not isinstance(levels, dict):
            logger.warning("live-config: %r is not a mapping, ignored: %r",
                           key, levels)
            return
        for name, level in levels.items():
            if self._applied_levels.get(name) == level:
                continue
            # getLevelName on an unknown name returns the string
            # "Level <x>", which setLevel rejects — normalize and
            # validate instead of letting ValueError escape.
            resolved = logging.getLevelName(str(level).upper())
            if not isinstance(resolved, int):
                logger.warning(
                    "live-config: unknown log level %r for logger %r, skipped",
                    level, name or "root",
                )
                continue
            target = logging.getLogger(None if name == "root" else name)
            old = logging.getLevelName(target.level)
            logger.info(
                "live-config: logger %r level %s -> %s", name or "root", old, level
            )
            target.setLevel(resolved)
            self._applied_levels[name] = level
