#!/usr/bin/env python
"""Build ``BENCH_BANDS.json`` from >=5 idle-host full-registry bench
runs at sf0.1 with REPEAT=3 (VERDICT r12 #1).

Usage:
    # run the measurements (serial, ~10 min each):
    python scripts/build_bench_bands.py --measure 5 --out-dir /tmp/bands
    # or fold existing artifacts:
    python scripts/build_bench_bands.py /tmp/bands/run_*.json

Each input run's "queries" values are already per-plan medians of 3
(bench.py's REPEAT protocol). The band per plan is the MEDIAN and MAD
of those run-medians across runs — a noise model of run-to-run
variation on a settled host, which is exactly what distinguishes "this
plan regressed" from "the host was busy" (see scripts/check_bench.py
for the decision procedure and PERF.md for the protocol).

Idle-host discipline: --measure refuses to start a run while the
1-minute load average exceeds --max-load (default 4.0 on 32 CPUs), and
stamps each run's load into the artifact (bench.py does this natively)
so a contaminated band source is detectable after the fact.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(n: int, out_dir: str, max_load: float, sf_dir: str) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n):
        while os.getloadavg()[0] > max_load:
            print(
                f"load {os.getloadavg()[0]:.1f} > {max_load}; waiting 60s "
                "for an idle host (bands from a busy host are worthless)",
                file=sys.stderr,
            )
            time.sleep(60)
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_REPEAT="3",
        )
        print(f"run {i + 1}/{n} ...", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if out.returncode != 0:
            sys.exit(f"bench run {i + 1} failed:\n{out.stderr[-2000:]}")
        rec = out.stdout.strip().split("\n")[0]  # line 1 = full record
        p = os.path.join(out_dir, f"run_{i + 1}.json")
        with open(p, "w") as f:
            f.write(rec + "\n")
        paths.append(p)
        print(f"  -> {p}", file=sys.stderr)
    return paths


def build(paths: list[str]) -> dict:
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    if len(runs) < 5:
        print(
            f"warning: only {len(runs)} runs; the protocol asks for >=5",
            file=sys.stderr,
        )
    for r in runs:
        if r.get("repeat") != 3 or r.get("sf") != 0.1 or r.get("only"):
            sys.exit(
                "band inputs must be FULL-registry sf0.1 REPEAT=3 runs; got "
                f"repeat={r.get('repeat')} sf={r.get('sf')} only={r.get('only')}"
            )
        if r.get("failed"):
            sys.exit(f"band input has failed plans: {r['failed'][:5]}")
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            sys.exit("runs cover different plan sets; rebuild from one code rev")
    plans = {}
    for name in sorted(names):
        vals = sorted(r["queries"][name] for r in runs)
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        plans[name] = {
            "median": round(med, 4),
            "mad": round(mad, 4),
            "min": round(vals[0], 4),
            "max": round(vals[-1], 4),
            "n": len(vals),
        }
    return {
        "protocol": "per-plan median+MAD of >=5 idle-host REPEAT=3 "
        "full-registry runs at sf0.1; see scripts/check_bench.py",
        "floors": {"rel": 0.25, "abs_sec": 0.15, "mads": 3},
        "measured": {
            "n_runs": len(runs),
            "host_cpus": runs[0].get("host_cpus"),
            "loads_start": [r.get("load_start") for r in runs],
            # ends too (r15, VERDICT r14 #4): check_bench's
            # comparability envelope is the per-component max over
            # start AND end stamps — a band says nothing about a run
            # captured at load above anything its sources ever saw
            "loads_end": [r.get("load_end") for r in runs],
            "totals_sec": [r.get("value") for r in runs],
        },
        "plans": plans,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="*", help="existing run_*.json files")
    ap.add_argument("--measure", type=int, default=0, metavar="N")
    ap.add_argument("--out-dir", default="/tmp/bench_bands")
    ap.add_argument("--max-load", type=float, default=4.0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_BANDS.json")
    )
    args = ap.parse_args()
    paths = list(args.inputs)
    if args.measure:
        paths += measure(args.measure, args.out_dir, args.max_load, args.sf_dir)
    if not paths:
        sys.exit("nothing to fold: pass run files or --measure N")
    bands = build(paths)
    with open(args.out + ".tmp", "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps({
        "out": args.out,
        "n_runs": bands["measured"]["n_runs"],
        "n_plans": len(bands["plans"]),
        "totals_sec": bands["measured"]["totals_sec"],
    }))


if __name__ == "__main__":
    main()
