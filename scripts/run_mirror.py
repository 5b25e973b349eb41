"""Persist the full in-repo oracle mirror as MIRROR_r{N}.json.

The external driver samples ~50 of the registered plans per round; this
script runs EVERY registered plan through ``venus_spark.oracle.run_all``
(the same sorted-columns / sorted-rows / exact-value compare the driver
uses) at sf0.01 and writes a per-plan record in the CORRECTNESS format
(``rows_match`` / ``schema_match`` / ``hash_match`` / ``err``), so the
plans outside the driver's sample carry committed, re-runnable evidence.

Usage::

    python scripts/run_mirror.py MIRROR_r4.json [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_record(r) -> dict:
    """CORRECTNESS row shape — canonical implementation lives in
    :func:`venus_spark.oracle.correctness_record` (r15: shared with the
    ``__spark_entry__.mirror`` driver entry point)."""
    from venus_spark.oracle import correctness_record

    return correctness_record(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output JSON path, e.g. MIRROR_r4.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--names",
        default=None,
        help="comma-separated plan subset (VERDICT r10 #3: the rotating "
        "never-driver-checked sample runs ~30 plans per round at sf0.1 — "
        "scale-dependent parity bugs escape the sf0.01 full mirror; the "
        "per-round slice is recorded in ROUND_NOTES)",
    )
    args = ap.parse_args()

    from venus_spark.oracle import run_all
    from venus_spark.session import get_spark

    names = None
    if args.names is not None:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        if not names:
            # an all-separator --names must not silently become a full
            # run — run_all treats [] as "no filter" (review r11 #5)
            raise SystemExit("--names parsed to an empty plan list")
        # validate BEFORE the (sf0.1: minutes-long) run, not after —
        # a typo must not discard a finished sample (review r11 #2)
        from venus_spark.plans import all_plans

        unknown = sorted(set(names) - set(all_plans()))
        if unknown:
            raise SystemExit(f"unknown plan names: {unknown}")

    spark = get_spark(cpus=args.cpus)
    t0 = time.time()
    results = run_all(spark, args.sf, names=names)
    out = {r.name: to_record(r) for r in results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    n_bad = sum(1 for r in results if not r.ok)
    print(
        json.dumps(
            {
                "plans": len(results),
                "failures": n_bad,
                "failed": [r.name for r in results if not r.ok],
                "sf_dir": args.sf,
                "elapsed_sec": round(time.time() - t0, 1),
                "out": args.out,
            }
        )
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
