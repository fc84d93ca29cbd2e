"""Dot-product scorer probe (r9, VERDICT r8 'Next round' #2): measure the
interpreted HOF fold (`dot_expr` = F.aggregate/zip_with, no whole-stage
codegen) against the Arrow-batched numpy scorer on the brute-force top-k
hot path, at growing corpus scale. The per-candidate dot product is the
inner loop of every vector operator; this is the SCALING.md r8 #3 method
applied to the one hot path it didn't cover.

Usage: python tools/dot_scorer_probe.py [SF_DIR]
Prints: variant x replication -> seconds (min of 3, warm).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

ID_STRIDE = 10_000_000
N_QUERIES = 100
K = 10


def replicate(d: DataFrame, n: int) -> DataFrame:
    out = d
    for i in range(1, n):
        out = out.unionByName(
            d.withColumn("vec_id", F.col("vec_id") + i * ID_STRIDE)
        )
    return out


def timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import similarity as sim

    spark = get_spark("dot-scorer-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    queries.collect()  # warm the query side out of the measurement

    base = emb.count()
    print(f"corpus base {base} rows x dim 64, {N_QUERIES} queries, k={K}")
    rows = []
    for reps in (1, 8, 64):
        corpus = replicate(emb, reps).repartition(32)
        corpus = corpus.localCheckpoint()  # pin input; measure scoring only
        n = corpus.count()
        t_fold = timed(
            lambda: sim.brute_force_topk(corpus, queries, k=K)
        )
        t_arrow = timed(
            lambda: sim.brute_force_topk_arrow(corpus, queries, k=K)
        )
        pairs = n * N_QUERIES
        print(
            f"{reps:>3}x ({n:>7} rows, {pairs/1e6:7.1f}M pairs): "
            f"fold {t_fold:6.2f}s  arrow {t_arrow:6.2f}s  "
            f"ratio {t_fold / t_arrow:4.1f}x"
        )
        rows.append((reps, n, t_fold, t_arrow))
    print("\n| replication | corpus rows | fold | arrow | fold/arrow |")
    print("|---|---|---|---|---|")
    for reps, n, tf, ta in rows:
        print(f"| {reps}x | {n} | {tf}s | {ta}s | {tf/ta:.1f}x |")


if __name__ == "__main__":
    main()
