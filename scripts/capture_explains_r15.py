"""Capture `.explain("formatted")` for the r15 optimization targets.

Usage::

    python scripts/capture_explains_r15.py before [name ...]
    python scripts/capture_explains_r15.py after  [name ...]

Writes ``plans/r15/<name>_<tag>.txt`` — the committed evidence the
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)

# The round's examined-and-touched (or examined-and-left) target set.
DEFAULT_TARGETS = [
    # vector-kernel family (flat fixed-dim fold rewrite)
    "sim_cosine_pairs",
    "sim_cosine_topk",
    "dedup_semantic_keep",
    "knn_join_topk",
    "hard_negatives_topk",
    "kmeans_refine",
    "embedding_outliers",
    "sim_ivf_topk",
    "sim_ivf_nprobe_sweep",
    "sim_ivfpq_recall",
    "sim_pq_adc_topk",
    "dedup_embedding_near",
    "quant_recall_topk",
    "hybrid_search_rrf",
    "sim_rp_lsh_topk",
    # aggregate/join-shape targets
    "q21_waiting_orders",
    "ngram_novelty",
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
