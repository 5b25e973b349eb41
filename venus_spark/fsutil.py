"""Filesystem helpers shared across the storage/maintenance modules.

One strict directory walk for every layout/bookkeeping probe:
``os.walk``'s default ``onerror=None`` silently swallows scandir
failures, so a transient FS outage (permission hiccup, NFS blip)
yields a SHORT listing that each caller then misreads in its own
dangerous way — an "empty" streaming sink (streamed rows silently
dropped from union-path results), a "fully retained" logs table (the
schema-rev record emptied), a backfill that omits a date directory's
abatch files while manifesting the batch as absorbed (rows
unrecoverable, review r8 #3's exact failure), or a corpus snapshot
pinning a subset of the real file set. Review r11 pass-8 #2 closed the
first instance; pass 9/10 hoisted the fix here so every walk-based
probe shares ONE strict implementation (a vanished directory remains
the legitimate empty case and stays quiet).
"""

from __future__ import annotations

import os


def _raise_unless_vanished(e: OSError) -> None:
    if not isinstance(e, FileNotFoundError):
        raise e


def walk_strict(path: str):
    """``os.walk`` that PROPAGATES scandir failures other than a
    vanished directory (``FileNotFoundError`` — legitimate
    empty/retained-away state, kept quiet)."""
    return os.walk(path, onerror=_raise_unless_vanished)
