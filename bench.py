#!/usr/bin/env python
"""Benchmark harness: run every registered plan once at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Execution is forced with a noop-format write (full materialization on
the executors, nothing collected to the driver), so timings measure the
distributed plan, not result transfer.

``$SPARK_GRAFT_REPEAT`` (default 1) runs every plan N times and reports
the per-plan MEDIAN: single-shot totals on this shared host swing
±10-20% run to run (PERF.md), so round-over-round comparisons should be
made on medians (the driver's per-round run keeps the default; the
recorded BENCH_SELF artifacts use REPEAT=3). The output contract is
unchanged — "queries" holds one number per plan — with "repeat" added
so a reader knows which protocol produced the file.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from venus_spark.plans import all_plans
from venus_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_REPEAT", "1")))
# comma-separated plan names: restrict the run (targeted re-measures
# with the exact harness — same warmup, same noop sink, same stamps).
# A restricted run is for PERF.md mover adjudication, never a BENCH
# artifact: the headline is only comparable across FULL-registry runs.
ONLY = {
    n.strip()
    for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
    if n.strip()
}


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def materialize(df) -> None:
    # noop sink: executes the whole plan, discards rows executor-side.
    df.write.format("noop").mode("overwrite").save()


def _host_load() -> list[float]:
    """1/5/15-minute load averages, rounded for the artifact; [-1]*3
    where the platform lacks getloadavg (keeps the contract total)."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except (AttributeError, OSError):
        return [-1.0, -1.0, -1.0]


def main() -> None:
    # Host-state stamps (VERDICT r9 #3): the r9 driver-vs-self bench
    # conflict (a uniform 1.27x elevation on untouched plans vs 0.93x
    # on a settled host) was adjudicable only by pattern-reading —
    # load averages at start/end make "was the host busy?" a one-field
    # check on every future artifact.
    load_start = _host_load()
    plans = all_plans()
    # validate the restriction BEFORE paying Spark startup + warmup +
    # prepare_all — a typo'd name must fail in milliseconds, and a
    # restricted run must be visible in the artifact itself ("only"
    # field below), not just in the invoker's shell history.
    if ONLY:
        missing = ONLY - set(plans)
        if missing:
            print(f"bench: unknown plan(s) {sorted(missing)}", file=sys.stderr)
            raise SystemExit(2)
        plans = {n: p for n, p in plans.items() if n in ONLY}
    spark = get_spark(app_name="venus_spark_bench")
    timings: dict[str, float] = {}

    # Warm the JVM + parquet footers once so q1 doesn't pay startup cost.
    from venus_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()

    # Build prepared (ingest-time) tables outside the timed region: index
    # builds are write-path work, exactly like the reference's GIN index
    # maintenance on INSERT.
    from venus_spark.prepared import prepare_all

    prepare_all(spark, SF_DIR)

    # SPARK_GRAFT_PROGRESS=1: per-run build/exec wall times to stderr
    # (r16 — adjudication instrumentation for the host's intermittent
    # degradation windows; stderr only, the stdout contract is
    # untouched and the timed region is identical).
    progress = bool(os.environ.get("SPARK_GRAFT_PROGRESS"))

    total0 = time.perf_counter()
    for name, p in sorted(plans.items()):
        runs: list[float] = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            try:
                df = p.fn(spark, SF_DIR)
                t1 = time.perf_counter()
                materialize(df)
                t2 = time.perf_counter()
                runs.append(t2 - t0)
                if progress:
                    print(
                        f"bench-progress: {name} build={t1 - t0:.3f} "
                        f"exec={t2 - t1:.3f} at={time.strftime('%H:%M:%S')}",
                        file=sys.stderr,
                    )
            except Exception as exc:  # keep the bench line parseable
                runs = []
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
                break
        timings[name] = (
            round(statistics.median(runs), 3) if runs else -1.0
        )
    # With REPEAT>1 the loop's wall time scales with REPEAT while the
    # per-plan entries are medians — so report the SUM OF MEDIANS as the
    # headline, keeping "value" comparable across protocols (for
    # REPEAT=1 the loop wall time is that sum plus scheduling overhead).
    if REPEAT > 1:
        total = round(sum(v for v in timings.values() if v > 0), 3)
    else:
        total = round(time.perf_counter() - total0, 3)

    print_result_lines(
        timings,
        total,
        REPEAT,
        sf_from_dir(SF_DIR),
        load={
            "start": load_start,
            "end": _host_load(),
            "cpus": os.cpu_count() or -1,
        },
        only=sorted(ONLY) if ONLY else None,
    )


# Sized so that (chunk line + final summary line + newlines) stays
# inside a 2000-char tail capture: the summary line is bounded ~500
# chars (counts, ten-name failed/only prefixes, load stamps), leaving
# ~1450 for the chunk. ~55 plans per chunk at current name lengths.
_CHUNK_MAX_CHARS = 1400


def _query_chunk_lines(
    timings: dict[str, float], repeat: int, sf: float
) -> list[str]:
    """The per-plan map re-encoded as complete-JSON lines, each at most
    ``_CHUNK_MAX_CHARS`` long, alphabetical order preserved across
    chunks (see the call site for the tail-capture geometry)."""
    envelope = len(
        json.dumps(
            {
                "metric": "per_plan_sec",
                "unit": "sec",
                "chunk": 99,
                "n_chunks": 99,
                "repeat": repeat,
                "sf": sf,
                "queries": {},
            },
            separators=(",", ":"),
        )
    )
    chunks: list[dict[str, float]] = []
    cur: dict[str, float] = {}
    cur_len = 0
    for name in sorted(timings):
        ent = len(json.dumps({name: timings[name]}, separators=(",", ":")))
        if cur and envelope + cur_len + ent > _CHUNK_MAX_CHARS:
            chunks.append(cur)
            cur, cur_len = {}, 0
        cur[name] = timings[name]
        cur_len += ent  # dict braces counted in envelope; +1 comma slack
    if cur:
        chunks.append(cur)
    return [
        json.dumps(
            {
                "metric": "per_plan_sec",
                "unit": "sec",
                "chunk": i,
                "n_chunks": len(chunks),
                "repeat": repeat,
                "sf": sf,
                "queries": ch,
            },
            separators=(",", ":"),
        )
        for i, ch in enumerate(chunks, 1)
    ]


def print_result_lines(
    timings: dict[str, float],
    total: float,
    repeat: int,
    sf: float,
    load: dict | None = None,
    only: list[str] | None = None,
) -> None:
    """Emit the output lines (factored so the tail contract is
    unit-testable without running plans):

    1. the full contract line — headline + per-plan map;
    2. the per-plan map again as tail-sized complete-JSON chunk lines
       (metric "per_plan_sec"; see the geometry note at the call
       below — r16);
    3. a compact totals-only summary as the FINAL line. The per-plan
       line has outgrown any fixed-size tail capture (183+ plans ≈
       6 KB), so a reader that keeps only the LAST ~2000 characters of
       stdout would otherwise see an unparseable fragment; the final
       line guarantees every tail capture ends with complete JSON
       (VERDICT r7 #8). The full breakdown stays on line 1, on the
       chunk lines, and in the committed BENCH_SELF_r* artifacts.
    """
    failed = sorted(k for k, v in timings.items() if v < 0)
    # host-state stamp on BOTH lines (VERDICT r9 #3): bounded — three
    # rounded floats each end plus a cpu count — so the tail contract's
    # size headroom holds; "load" absent means a pre-r10 artifact.
    load = load or {}
    full = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "load_start": load.get("start"),
        "load_end": load.get("end"),
        "host_cpus": load.get("cpus"),
        # non-null ONLY marks a RESTRICTED re-measure run: its
        # headline covers just these plans and must never be
        # compared against a full-registry artifact (review
        # r10 #4 — provenance is a one-field check, like load)
        "only": only,
        "queries": timings,
        # total_wall_sec spans the whole loop INCLUDING time a
        # failed plan burned before throwing (its queries entry
        # is -1.0); the explicit list keeps the headline number
        # honest when cross-checking against the breakdown.
        "failed": failed,
        "repeat": repeat,
        "sf": sf,
    }
    print(json.dumps(full, separators=(",", ":")))
    # Sidecar with the FULL per-plan map (VERDICT r13 #4): the driver's
    # capture keeps only the last ~2000 chars of stdout, losing ~126 of
    # 190 plan timings per round; check_bench.py adopts this file when
    # its entries agree with the tail fragment (proof of same-run
    # provenance). Atomic write; best-effort — the stdout contract is
    # the primary artifact and must survive a read-only checkout.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    # A RESTRICTED re-measure (SPARK_GRAFT_ONLY) must not clobber the
    # last full run's sidecar — check_bench's tail-agreement proof
    # would reject the partial file and silently fall back to the
    # 64-plan tail fragment, recreating the very gap the sidecar fixes.
    if only:
        detail_path = "-"
    if detail_path != "-":  # "-" disables the sidecar
        try:
            tmp = f"{detail_path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(full, f, separators=(",", ":"))
            os.replace(tmp, detail_path)
        except OSError as exc:
            print(f"bench: BENCH_DETAIL sidecar not written: {exc}",
                  file=sys.stderr)
    # Tail-safe per-plan re-emit (VERDICT r15 "what's wrong" #1 / task
    # #2): the driver keeps only the last ~2000 chars of stdout, and the
    # full 192-plan map is ~5.2 KB — it cannot fit on ANY single
    # tail-visible line, so line 1 alone loses ~2/3 of the per-plan
    # timings to truncation every round. Re-emit the SAME map (same
    # names, same seconds) as complete-JSON chunk lines immediately
    # before the final summary: each chunk + the summary line fit the
    # tail together, so a tail capture always ends with parseable
    # per-plan JSON covering the alphabetical suffix (the same suffix
    # recoverable from the r15 tail fragment — maximizing the driver's
    # round-over-round common set), and a reader with a larger buffer
    # recovers the whole map from the chunk lines alone. Chunks carry
    # metric "per_plan_sec" (never "total_wall_sec") and no "value", so
    # a parser keyed on the headline contract cannot mistake one for
    # the summary. Additions-only: line 1 and the final summary line
    # are byte-identical to the r15 contract.
    for line in _query_chunk_lines(timings, repeat, sf):
        print(line)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "n_plans": len(timings),
                # the final line must stay under any fixed-size tail
                # capture even in a systemic-failure run (review r8
                # pass-7 #2: an unbounded name list breaks the tail
                # contract exactly when the tail matters most) — the
                # full failed list stays on line 1
                "n_failed": len(failed),
                "failed": failed[:10],
                "repeat": repeat,
                "sf": sf,
                "load_start": load.get("start"),
                "load_end": load.get("end"),
                "host_cpus": load.get("cpus"),
                # bounded like the failed list: a count plus a prefix
                "n_only": len(only) if only else 0,
                "only": (only or [])[:10] or None,
                "summary_of": "per-plan timings on the first output line",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
