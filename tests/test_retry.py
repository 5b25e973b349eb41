"""The engine-internal retry-on-conflict contract (venus_spark/retry.py,
VERDICT r14 #2): raced live reads — a plan whose file listing went stale
because a concurrent merge/vacuum moved the files — must be absorbed by
one in-engine replan+retry, without any caller-side retry loop. The
cross-process end-to-end proof lives in test_prepared.py
(test_cross_process_merge_visible_and_retryable, whose reader carries NO
retry loop since r15); these tests pin the wrapper mechanics in
isolation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from venus_spark.retry import (
    RetryingDataFrame,
    _is_missing_file_error,
    retryable,
)


def _write_corpus(spark, path: str, lo: int, hi: int, files: int = 4) -> None:
    (
        spark.range(lo, hi)
        .withColumn("v", F.col("id") * 2)
        .repartition(files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_wrapper_is_a_dataframe_and_transparent(spark, tmp_path):
    """The armed frame IS a DataFrame: schema, transformations and
    actions behave exactly like the plain read (transformations return
    plain frames — the retry scope is the built view, by design)."""
    p = str(tmp_path / "t.parquet")
    _write_corpus(spark, p, 0, 100)
    df = retryable(lambda: spark.read.parquet(p))
    assert isinstance(df, DataFrame)
    assert isinstance(df, RetryingDataFrame)
    assert df.count() == 100
    assert {r["id"] for r in df.filter(F.col("id") < 3).collect()} == {0, 1, 2}
    assert df.toPandas().shape == (100, 2)
    assert not df.isEmpty()
    assert len(df.take(5)) == 5


def test_raced_swap_retried_once_inside_the_engine(spark, tmp_path):
    """The conflict itself: plan lists generation-1 files, a 'merge'
    replaces them before execution. The PLAIN frame dies with the
    missing-file conflict; the armed frame replans via the builder and
    serves the post-swap view — no caller retry."""
    p = str(tmp_path / "g.parquet")
    _write_corpus(spark, p, 0, 50)

    builds = []

    def build() -> DataFrame:
        builds.append(1)
        return spark.read.parquet(p)

    stale_plain = spark.read.parquet(p)  # listing taken now
    stale_armed = retryable(build)  # listing taken now, builder kept
    assert len(builds) == 1

    # the "merge": a new generation replaces every data file
    for fn in os.listdir(p):
        if fn.endswith(".parquet"):
            os.remove(os.path.join(p, fn))
    _write_corpus(spark, str(tmp_path / "g2.parquet"), 0, 80)
    for fn in os.listdir(str(tmp_path / "g2.parquet")):
        os.rename(
            os.path.join(str(tmp_path / "g2.parquet"), fn),
            os.path.join(p, fn),
        )

    with pytest.raises(Exception) as ei:
        stale_plain.count()
    assert _is_missing_file_error(ei.value)

    assert stale_armed.count() == 80  # replanned + retried internally
    assert len(builds) == 2


def test_construction_conflict_rebuilt_once(spark, tmp_path):
    """CONSTRUCTION is under the contract too (r15 full-suite chaos
    catch): the builder's read performs listing + footer schema
    inference at plan time, so a raced merge can kill build() itself
    before any action exists to retry. retryable() must refresh the
    named listings and re-invoke the builder once — and only for the
    missing-file class."""
    p = str(tmp_path / "t.parquet")
    _write_corpus(spark, p, 0, 30)
    builds = []

    def build() -> DataFrame:
        builds.append(1)
        if len(builds) == 1:
            raise Exception(
                "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error "
                f"while reading file file://{p}/part-gone.parquet. "
                "File does not exist."
            )
        return spark.read.parquet(p)

    df = retryable(build)
    assert len(builds) == 2  # failed construction + one rebuild
    assert df.count() == 30

    def always_bad() -> DataFrame:
        raise ValueError("analysis bug, not a conflict")

    with pytest.raises(ValueError):
        retryable(always_bad)  # non-conflict build errors propagate


def test_non_conflict_errors_propagate_without_replan(spark, tmp_path):
    """Only the missing-file conflict class is retried: any other
    execution error re-raises immediately and the builder is NOT
    re-invoked (a wrong-answer bug must never be masked by replans)."""
    p = str(tmp_path / "t.parquet")
    _write_corpus(spark, p, 0, 10)
    builds = []

    def build() -> DataFrame:
        builds.append(1)
        return spark.read.parquet(p)

    df = retryable(build)

    def boom(_df):
        raise ValueError("not a file conflict")

    with pytest.raises(ValueError):
        df._vs_retry(boom)
    assert len(builds) == 1  # no replan


def test_second_conflict_reraises_after_one_replan(spark, tmp_path):
    """One replan, not a loop: if the retried action hits the conflict
    again the error surfaces (a standing stream of merges outrunning
    retries is an operational signal, not something to mask)."""
    p = str(tmp_path / "t.parquet")
    _write_corpus(spark, p, 0, 10)
    builds = []

    def build() -> DataFrame:
        builds.append(1)
        return spark.read.parquet(p)

    df = retryable(build)

    class Conflict(Exception):
        pass

    def always_conflict(_df):
        raise Conflict("java.io.FileNotFoundException: /gone.parquet")

    with pytest.raises(Conflict):
        df._vs_retry(always_conflict)
    assert len(builds) == 2  # initial build + exactly one replan


def test_registry_plans_are_retry_armed(spark):
    """Every registered plan's result carries the contract — the driver
    acts on plan results directly, so the arming must happen at the
    registry seam, not only inside the live builders."""
    from venus_spark.plans import all_plans

    plans = all_plans()
    df = plans["events_scan_filter"].fn(spark, "/root/testdata/sf0.001")
    assert isinstance(df, RetryingDataFrame)
    assert df.count() >= 0


def test_live_views_are_retry_armed(spark, tmp_path, monkeypatch):
    """The live union builders arm their result even outside the
    registry (direct library use — the chaos test's reader)."""
    from venus_spark import prepared

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = "/root/testdata/sf0.001"
    prepared.documents_minhash(spark, sf)
    live = prepared.documents_minhash_live(spark, sf)
    assert isinstance(live, RetryingDataFrame)
    assert live.count() > 0
    post, dfreq, stats = prepared.documents_postings_live(spark, sf)
    assert isinstance(post, RetryingDataFrame)
    assert isinstance(dfreq, RetryingDataFrame)
    trgm = prepared.documents_trgm_postings_live(spark, sf)
    assert isinstance(trgm, RetryingDataFrame)


def test_write_path_is_retry_armed(spark, tmp_path):
    """Writes materialize the plan like collect() does (bench's noop
    sink, every ETL job): the recording writer proxy must replay its
    builder chain (format/mode/...) onto a replanned frame and succeed
    after a raced swap that kills the plain writer."""
    p = str(tmp_path / "g.parquet")
    _write_corpus(spark, p, 0, 50)
    builds = []

    def build() -> DataFrame:
        builds.append(1)
        return spark.read.parquet(p)

    stale_plain = spark.read.parquet(p)
    armed = retryable(build)
    writer = armed.write.format("noop").mode("overwrite")  # chain recorded

    # the swap: a new generation replaces every data file
    for fn in os.listdir(p):
        if fn.endswith(".parquet"):
            os.remove(os.path.join(p, fn))
    _write_corpus(spark, str(tmp_path / "g2.parquet"), 0, 80)
    for fn in os.listdir(str(tmp_path / "g2.parquet")):
        os.rename(
            os.path.join(str(tmp_path / "g2.parquet"), fn),
            os.path.join(p, fn),
        )

    with pytest.raises(Exception) as ei:
        stale_plain.write.format("noop").mode("overwrite").save()
    assert _is_missing_file_error(ei.value)

    writer.save()  # replans + replays the chain internally
    assert len(builds) == 2

    # a real parquet write through the proxy lands the right rows
    out = str(tmp_path / "out.parquet")
    retryable(build).write.mode("overwrite").parquet(out)
    assert spark.read.parquet(out).count() == 80
