#!/usr/bin/env python
"""Final-commit bench protocol (VERDICT r14 #1): the code a round ships
must carry a self-bench of EXACTLY that code — r14's last three commits
landed after the round's self-bench and bands runs, so the driver's
elevated numbers could not be attributed between guard cost and host
noise without a full adjudication cycle.

Runs the full-registry bench at sf0.1 with the band protocol
(REPEAT=3 per-plan medians) in a subprocess, stamps the artifact with
the exact git HEAD it measured, adjudicates it against
``BENCH_BANDS.json`` via scripts/check_bench, and writes
``BENCH_FINAL_r{N}.json``. Refuses a dirty working tree by default —
an artifact that doesn't match a commit defeats the protocol.

Usage::

    python scripts/bench_final.py BENCH_FINAL_r15.json [--allow-dirty]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output path, e.g. BENCH_FINAL_r15.json")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--allow-dirty",
        action="store_true",
        help="bench an uncommitted tree anyway (artifact marked dirty)",
    )
    args = ap.parse_args()

    head = git("rev-parse", "HEAD")
    dirty = bool(git("status", "--porcelain"))
    if dirty and not args.allow_dirty:
        sys.exit(
            "working tree is dirty — commit first (the artifact must "
            "describe exactly one commit) or pass --allow-dirty"
        )

    env = dict(os.environ)
    env["SPARK_GRAFT_REPEAT"] = str(args.repeat)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the artifact's headline is only meaningful for a FULL-registry
    # run — never inherit a stray restriction from the caller's shell
    env.pop("SPARK_GRAFT_ONLY", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit(f"bench.py failed rc={proc.returncode}")
    # line 1 is the full per-plan record (bench.py output contract)
    record = json.loads(proc.stdout.splitlines()[0])

    import check_bench

    with open(os.path.join(REPO, "BENCH_BANDS.json")) as f:
        bands = json.load(f)
    verdict = check_bench.check(record, bands)

    artifact = {
        "protocol": (
            f"full-registry self-bench of the shipped commit, REPEAT="
            f"{args.repeat} per-plan medians (scripts/bench_final.py)"
        ),
        "git_head": head,
        "dirty_tree": dirty,
        **record,
        "band_check": verdict,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, separators=(",", ":"))
        f.write("\n")
    print(json.dumps({
        "out": args.out,
        "git_head": head[:12],
        "dirty_tree": dirty,
        "total_sec": record.get("value"),
        "n_plans": len(record.get("queries", {})),
        "n_failed": len(record.get("failed", [])),
        "band_verdict": verdict.get("verdict"),
        "n_over": verdict.get("n_over"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
