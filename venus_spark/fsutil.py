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


def walk_strict(path: str):
    """``os.walk`` that PROPAGATES scandir failures, with exactly ONE
    quiet case: the walk ROOT itself being absent (the documented
    legitimate empty/retained-away state). A SUBDIRECTORY vanishing
    mid-walk — e.g. concurrent retention/vacuum removing a ``date=``
    partition while a backfill enumerates abatch files — previously
    stayed quiet too and yielded a silently short listing, the same
    silent-subset failure class (review r8 #3) this helper was created
    to close; it now raises like any other scandir failure (ADVICE r12
    #3). Callers that hit it are racing a maintenance writer: loud and
    retryable beats a partial answer manifested as complete."""
    top = os.path.abspath(path)

    def onerror(e: OSError) -> None:
        if (
            isinstance(e, FileNotFoundError)
            and e.filename is not None
            and os.path.abspath(e.filename) == top
        ):
            return  # absent root: legitimate empty
        raise e

    return os.walk(path, onerror=onerror)
