"""Streamed-sink oracle mirror (VERDICT r8 #6): certify the live events
plans on the UNION path, not the degraded one.

The plain mirror (``run_mirror.py``) runs every plan on quiescent sf
dirs, where the live plans (``json_containment_indexed_live``,
``json_key_discovery_live``, ``json_key_frequency_live``) degrade to
the prepared-only branch — their green rows certify the degraded path
and the streamed half lives only in pytest. This script builds a
workspace sf dir (base tables symlinked), LANDS REAL STREAMED BATCHES
through ``start_events_rollup_ingest`` (the same foreachBatch writer a
deployment runs — kv postings, dfreq partials, rollup, facts, commit
receipt), then compares each live plan against its own registered
oracle SQL evaluated over ``events = base UNION ALL sink facts`` in
DuckDB — so the committed artifact hash-certifies the base-∪-sink
serve path end to end.

The streamed batches are constructed so the union path is PROVABLY the
one exercised: two of the streamed events satisfy the containment
predicate (k=7 ∧ type=click ∧ uid present) while every batch also
carries non-matching rows, and the artifact records the prepared
(cold) twin's count next to the live count — the live result must be
strictly larger or the run fails.

Usage::

    python scripts/run_mirror_streamed.py MIRROR_STREAMED_r9.json \
        [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_mirror import to_record  # noqa: E402  (same dir at runtime)

LIVE_PLANS = (
    "json_containment_indexed_live",
    "json_key_discovery_live",
    "json_key_frequency_live",
)

# streamed events: ids disjoint from every base corpus by contract
# (events_stream_sink_dir docstring); two containment MATCHES, one miss
# per conjunct, spread over two micro-batches so multi-batch union +
# dfreq partial summing is on the certified path
_BATCHES = [
    [
        dict(event_id=9_000_001, ts="2024-06-01 10:01:00", user_id=7,
             event_type="click", value=1.0, props='{"k": 7}'),
        dict(event_id=9_000_002, ts="2024-06-01 10:02:00", user_id=9,
             event_type="click", value=1.0, props='{"k": 7}'),  # uid absent
        dict(event_id=9_000_003, ts="2024-06-01 10:03:00", user_id=8,
             event_type="view", value=1.0, props='{"k": 7}'),
    ],
    [
        dict(event_id=9_000_004, ts="2024-06-01 11:01:00", user_id=11,
             event_type="click", value=2.0, props='{"k": 7}'),
        dict(event_id=9_000_005, ts="2024-06-01 11:02:00", user_id=13,
             event_type="click", value=2.0, props='{"k": 8}'),
    ],
]
_EXPECT_NEW_MATCHES = 2  # 9_000_001 and 9_000_004


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output JSON path, e.g. MIRROR_STREAMED_r9.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    from venus_spark.oracle import compare, duckdb_connect
    from venus_spark.plans import all_plans
    from venus_spark.session import get_spark
    from venus_spark.sources import TABLES
    from venus_spark.streaming import (
        EVENTS_STREAM_SCHEMA,
        events_stream_sink_dir,
        start_events_rollup_ingest,
    )

    spark = get_spark(cpus=args.cpus)
    t0 = time.time()

    # workspace sf dir: base tables symlinked. The sf BASENAME must be
    # unique per run — prepared_path namespaces artifacts by basename
    # alone, so a constant name would silently reuse (or concurrently
    # clobber) a crashed prior run's prepared layouts, certifying
    # against the wrong corpus (review r9 pass-2 #2). The mkdtemp
    # suffix provides the uniqueness.
    work = tempfile.mkdtemp(prefix="streamed_mirror_")
    sf_name = f"sf_{os.path.basename(work)}"
    sf = os.path.join(work, sf_name)
    os.makedirs(sf)
    for t in TABLES:
        src = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(sf, f"{t}.parquet"))

    try:
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        for i, batch in enumerate(_BATCHES):
            with open(os.path.join(landing, f"b{i}.jsonl"), "w") as f:
                f.write("\n".join(json.dumps(e) for e in batch))
        sink = events_stream_sink_dir(sf)
        q = start_events_rollup_ingest(
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(landing),
            sink_dir=sink,
            checkpoint_dir=os.path.join(work, "ckpt"),
            trigger_seconds=None,  # availableNow: drain and stop
        )
        if not q.awaitTermination(300):
            print(json.dumps({"error": "ingest did not drain in 300 s"}))
            return 1

        # the oracle's world: events = base UNION ALL the sink's facts
        # (the _batch_id partition dirs are layout, not data — the
        # non-hive read keeps them out)
        con = duckdb_connect(sf)
        cols = "event_id, ts, user_id, event_type, value, props"
        con.execute(
            f"""
            CREATE OR REPLACE VIEW events AS
            SELECT {cols} FROM '{os.path.join(sf, "events.parquet")}'
            UNION ALL
            SELECT {cols} FROM read_parquet(
                '{os.path.join(sink, "events")}/*/*.parquet')
            """
        )

        plans = all_plans()
        results = {}
        ok = True
        for name in LIVE_PLANS:
            r = compare(name, plans[name].fn(spark, sf), con, plans[name].oracle)
            results[name] = to_record(r)
            ok = ok and r.ok

        # prove the UNION path (not the degraded branch) answered: the
        # prepared twin cannot see the streamed matches pre-merge
        cold = plans["json_containment_indexed"].fn(spark, sf).count()
        live = plans["json_containment_indexed_live"].fn(spark, sf).count()
        union_engaged = live == cold + _EXPECT_NEW_MATCHES
        ok = ok and union_engaged

        out = {
            "mode": "streamed-sink union (VERDICT r8 #6)",
            "base_sf": args.sf,
            "streamed_batches": len(_BATCHES),
            "streamed_events": sum(len(b) for b in _BATCHES),
            "containment_cold_rows": cold,
            "containment_live_rows": live,
            "union_path_engaged": union_engaged,
            "plans": results,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        print(
            json.dumps(
                {
                    "plans": len(results),
                    "failures": sum(
                        1 for n in LIVE_PLANS if not results[n]["hash_match"]
                    ),
                    "union_path_engaged": union_engaged,
                    "elapsed_sec": round(time.time() - t0, 1),
                    "out": args.out,
                }
            )
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        # the workspace prepared artifacts are keyed by the sf basename
        from venus_spark.prepared import PREPARED_ROOT

        shutil.rmtree(
            os.path.join(PREPARED_ROOT, sf_name), ignore_errors=True
        )


if __name__ == "__main__":
    raise SystemExit(main())
