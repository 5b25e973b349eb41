#!/usr/bin/env python
"""Adjudicate a BENCH artifact against the committed per-plan noise
bands (``BENCH_BANDS.json``) — the mechanical replacement for the
per-round ABA reruns that rounds 9 and 12 burned on shared-host noise
(VERDICT r12 #1).

Usage:
    python scripts/check_bench.py BENCH_r13.json [--bands BENCH_BANDS.json]

Accepts BOTH artifact shapes: a full bench record (the "queries" dict
bench.py prints on line 1) and the DRIVER's capture format, which
stores only the LAST 2000 characters of stdout — for the latter the
per-plan pairs are recovered from the tail fragment by regex, so the
check covers the recoverable suffix (reported as ``partial_from_tail``)
plus the summary stamps.

For every plan, compares its seconds against the band
``median + 3*MAD`` with two widenings: a floor (MAD collapses to ~0 on
very stable plans and sub-second plans jitter by scheduler
granularity: ``max(3*MAD, 0.25*median, 0.15s)``), and a lower bound of
``1.10 * band max`` — five samples underestimate the tail, and a bar
the band's OWN sources would trip is not a noise model (the
constants travel in the bands file, not hardcoded trust). Prints ONE
JSON line:

    {"n_plans": N, "n_over": K, "over": [{"plan": ..., "sec": ...,
      "band_median": ..., "band_mad": ..., "threshold": ...}, ...],
      "median_ratio": R, "verdict": "within-bands" | "host-elevated" |
      "elevated" | "plan-regressions", "remeasure_cmd": ...}

Load normalization (VERDICT r14 #4): the bands file records the host
load stamps of its own measurement runs; when the artifact's 1/5/15-min
load stamps exceed that envelope (any component, start or end), flagged
plans are NOT comparable against the bands — the verdict becomes
``host-elevated`` instead of listing dozens of false plan flags, and
``remeasure_cmd`` carries the exact SPARK_GRAFT_ONLY command that
re-measures the flagged set with the band protocol (REPEAT=3) once the
host settles. ``remeasure_cmd`` is emitted for every non-clean verdict.

Interpretation protocol (PERF.md):
- ``median_ratio`` (the median of per-plan sec/band_median) far above
  1 with MANY plans over → host contamination (check the artifact's
  load_start/load_end stamps), not a code regression.
- a FEW plans over while median_ratio ~ 1 → those plans regressed;
  re-measure exactly them with SPARK_GRAFT_ONLY + REPEAT=3.
- bands were measured with REPEAT=3 medians on an idle host; a
  repeat=1 artifact (the driver's default) is noisier, which the
  0.25*median floor absorbs.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def queries_from(
    artifact: dict, detail: dict | None = None
) -> tuple[dict, bool]:
    """Per-plan seconds from either artifact shape. Returns
    (queries, partial): partial=True when recovered from a driver
    tail capture (prefix plans truncated away).

    When a ``BENCH_DETAIL.json`` sidecar (VERDICT r13 #4 — bench.py
    writes the full line-1 record there) is supplied, it is adopted in
    place of the tail fragment IF every plan pair recovered from the
    tail agrees with the sidecar exactly — same names, same seconds —
    which is the same-run provenance proof (a stale sidecar from a
    different run would disagree on the sub-millisecond timings)."""
    if "queries" in artifact:
        return artifact["queries"], False
    tail = artifact.get("tail", "")
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*(-?[0-9.]+)', tail)
    drop = {
        "value", "sf", "repeat", "n_plans", "n_failed", "n_only",
        "host_cpus", "elapsed_sec",
    }
    # no truncation handling needed for the first pair: the capture is
    # a SUFFIX, so a name cut at the tail's start lost its opening
    # quote and the regex never matches it — every matched pair is
    # complete (values sit left of their cut point too)
    out = {}
    for name, sec in pairs:
        if name not in drop:
            out[name] = float(sec)
    dq = (detail or {}).get("queries")
    if dq and out and all(dq.get(k) == v for k, v in out.items()):
        return dq, False
    return out, True


def artifact_loads(artifact: dict) -> dict:
    """The artifact's 1/5/15-min load stamps. The DRIVER's capture
    shape nests the summary line under ``parsed`` (the top level holds
    only rc/tail); a self-bench record carries them at top level."""
    src = artifact if "load_start" in artifact else artifact.get("parsed", {})
    return {"start": src.get("load_start"), "end": src.get("load_end")}


def load_envelope(bands: dict) -> list[float] | None:
    """Per-component max of the load stamps (start AND end) the bands
    were measured under — the comparability envelope: a band built on
    a host at load L says nothing about a run captured at load > L.
    Pre-r15 bands files lack ``loads_end``; the start stamps alone
    still bound the envelope then."""
    measured = bands.get("measured") or {}
    runs = (measured.get("loads_start") or []) + (
        measured.get("loads_end") or []
    )
    runs = [r for r in runs if isinstance(r, list) and len(r) == 3]
    if not runs:
        return None
    return [max(r[i] for r in runs) for i in range(3)]


def exceeds_envelope(loads: dict, env: list[float] | None) -> bool:
    if env is None:
        return False
    for stamp in (loads.get("start"), loads.get("end")):
        if isinstance(stamp, list) and len(stamp) == 3:
            if any(s > e for s, e in zip(stamp, env) if s is not None and s >= 0):
                return True
    return False


def check(artifact: dict, bands: dict, detail: dict | None = None) -> dict:
    floors = bands.get("floors", {"rel": 0.25, "abs_sec": 0.15, "mads": 3})
    queries, partial = queries_from(artifact, detail)
    over = []
    ratios = []
    missing = []
    for plan, sec in sorted(queries.items()):
        band = bands["plans"].get(plan)
        if band is None:
            missing.append(plan)
            continue
        med, mad = band["median"], band["mad"]
        if sec < 0:  # bench.py marks failed plans -1
            over.append({"plan": plan, "sec": sec, "band_median": med,
                         "band_mad": mad, "threshold": None,
                         "note": "FAILED in artifact"})
            continue
        thr = med + max(floors["mads"] * mad,
                        floors["rel"] * med, floors["abs_sec"])
        thr = max(thr, 1.10 * band.get("max", 0.0))
        if med > 0:
            ratios.append(sec / med)
        if sec > thr:
            over.append({
                "plan": plan, "sec": round(sec, 3),
                "band_median": med, "band_mad": mad,
                "threshold": round(thr, 3),
                "ratio": round(sec / med, 2) if med else None,
            })
    over.sort(key=lambda o: -(o.get("ratio") or 99))
    median_ratio = round(statistics.median(ratios), 3) if ratios else None
    n = len(queries)
    loads = artifact_loads(artifact)
    env = load_envelope(bands)
    host_hot = exceeds_envelope(loads, env)
    if not over:
        verdict = "within-bands"
    elif host_hot:
        # load-normalized verdict (VERDICT r14 #4): the run was
        # captured under more host load than ANY of the bands' own
        # measurement runs, so per-plan flags are not evidence of
        # code regressions — don't emit dozens of false flags, emit
        # the settled-host re-measure command instead
        verdict = "host-elevated, bands not comparable"
    elif median_ratio is not None and median_ratio > 1.2 and len(over) >= n / 5:
        verdict = "elevated"  # broad uniform elevation = host, not code
    else:
        verdict = "plan-regressions"
    remeasure = None
    if over:
        flagged = ",".join(sorted(o["plan"] for o in over))
        remeasure = (
            f"SPARK_GRAFT_ONLY={flagged} SPARK_GRAFT_REPEAT=3 "
            "python bench.py   # re-measure flagged set with the band "
            "protocol on a settled host"
        )
    return {
        "n_plans": n,
        "partial_from_tail": partial,
        "n_over": len(over),
        "median_ratio": median_ratio,
        "verdict": verdict,
        "load_exceeds_band_envelope": host_hot,
        "band_load_envelope": env,
        "bands_measured_at": bands.get("measured", {}),
        "artifact_load": loads,
        "remeasure_cmd": remeasure,
        "plans_not_in_bands": missing,
        "over": over[:25],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact", help="a BENCH_*.json (driver or self)")
    ap.add_argument(
        "--bands", default=os.path.join(REPO, "BENCH_BANDS.json")
    )
    ap.add_argument(
        "--detail",
        default=os.path.join(REPO, "BENCH_DETAIL.json"),
        help="bench.py's full-record sidecar; adopted for a tail-"
        "capture artifact only when its timings match the tail",
    )
    args = ap.parse_args()
    with open(args.artifact) as f:
        artifact = json.load(f)
    detail = None
    try:
        with open(args.detail) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        pass
    if artifact.get("sf") != 0.1:
        print(
            f"warning: artifact sf={artifact.get('sf')} but bands were "
            "measured at sf0.1 — comparison is not meaningful",
            file=sys.stderr,
        )
    with open(args.bands) as f:
        bands = json.load(f)
    print(json.dumps(check(artifact, bands, detail)))


if __name__ == "__main__":
    main()
