"""Quantify the `conformant_vectors` filter's cost (VERDICT r15 #6).

The r15 build round added a per-row O(dims) codegen predicate
(non-NULL, non-empty, no NULL/NaN/Inf component) to every similarity
QUERY, mirrored in the oracles — a correctness contract whose runtime
cost was never recorded. This probe times each vector-family bench
query as committed vs with `conformant_vectors` monkeypatched to
identity, interleaved in one session (min-of-N per variant, per-variant
cache rebuild). The identity variant is a MEASUREMENT ONLY — it would
crash/diverge on poisoned rows; the clean testdata corpora make the two
variants row-identical, so the delta is pure filter overhead.

Usage: python tools/vector_conformance_probe.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bm25_retrieval regressed alongside this family in PERF_r15 but has no
# embedding column — it never passes through conformant_vectors, so it
# is not probed here (its drift is the box, not the filter)
QUERIES = ["vector_topk", "knn_classify", "knn_classify_ivf", "cosine_pairs"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import similarity as sim
    from core_telecoms_etl_spark import queries as qmod

    spark = get_spark("conformance-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = qmod.queries()

    real_filter = sim.conformant_vectors
    variants = {
        "with_filter": real_filter,
        "no_filter": lambda df, vec_col="embedding": df,
    }
    times: dict[str, dict[str, list[float]]] = {
        q: {v: [] for v in variants} for q in QUERIES
    }
    for _ in range(reps):
        for vname, impl in variants.items():
            sim.conformant_vectors = impl
            try:
                for q in QUERIES:
                    spark.catalog.clearCache()
                    df = qs[q](spark, sf_dir)
                    spark.sparkContext.setJobDescription(f"{q}:{vname}")
                    t0 = time.time()
                    df.write.mode("overwrite").format("noop").save()
                    times[q][vname].append(time.time() - t0)
            finally:
                sim.conformant_vectors = real_filter
    print(f"{'query':20s} {'with_filter':>12s} {'no_filter':>12s} {'delta':>8s}")
    for q in QUERIES:
        wf = min(times[q]["with_filter"])
        nf = min(times[q]["no_filter"])
        delta = (wf - nf) / nf * 100 if nf else float("nan")
        print(f"{q:20s} {wf:12.3f} {nf:12.3f} {delta:7.1f}%")


if __name__ == "__main__":
    main()
