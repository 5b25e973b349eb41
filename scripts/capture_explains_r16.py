"""Capture `.explain("formatted")` for the r16 optimization targets.

Usage::

    python scripts/capture_explains_r16.py before [name ...]
    python scripts/capture_explains_r16.py after  [name ...]

Writes ``plans/r16/<name>_<tag>.txt`` — the committed evidence the
optimization round's plan-diff claims are checked against. Captured at
the bench SF (sf0.1) so the shapes are the ones the bench measures.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)

# The round's VERDICT-ranked target set (r15 VERDICT "Next round").
DEFAULT_TARGETS = [
    "sim_pq_adc_topk",
    "curated_corpus",
    "curated_corpus_colocated",
    "q21_waiting_orders",
    "rfm_segments",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS

    from venus_spark.plans import all_plans
    from venus_spark.prepared import prepare_all
    from venus_spark.session import get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"venus_spark_explains_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    prepare_all(spark, SF_DIR)
    plans = all_plans()
    for name in names:
        df = plans[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR} [{tag}]\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
