"""kmeans build probe (VERDICT r11 ask #2 done-criterion): per-iteration
wall time of the order-fixed Arrow `kmeans_centroids` vs the retained
declarative fold reference `_kmeans_centroids_fold`, at the same
10^6-vector x 64-dim synthetic shape the r11 verdict measured the fold
form at (26.8 s/iter). Also asserts the two forms still agree on the
surviving cluster ids at this scale.

Usage: python tools/kmeans_probe.py [n_vectors] [dim] [k] [iters]
Prints one JSON line: {"n": ..., "dim": ..., "k": ..., "iters": ...,
"arrow_sec_per_iter": ..., "fold_sec_per_iter": ..., "speedup": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import similarity as sim

    spark = get_spark("kmeans-probe")
    # deterministic synthetic corpus, generated engine-side (same recipe
    # as tools/vector_mem_probe.py): per-component hash-derived uniforms
    vecs = (
        spark.range(n)
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(10_000))
                    / 5_000.0
                    - 1.0
                ),
            ),
        )
        .withColumnRenamed("id", "vec_id")
    )
    vecs.write.mode("overwrite").parquet("/tmp/kmeans_probe_vecs")
    df = spark.read.parquet("/tmp/kmeans_probe_vecs")

    # warm the python workers + JIT so both arms measure steady state
    # (cold spin-up is ~4 s of the first mapInPandas pass)
    sim.kmeans_centroids(df.limit(50_000), k=k, iters=1).count()

    t0 = time.monotonic()
    arrow = {
        r.centroid_id
        for r in sim.kmeans_centroids(df, k=k, iters=iters).collect()
    }
    arrow_s = (time.monotonic() - t0) / iters

    t0 = time.monotonic()
    fold = {
        r.centroid_id
        for r in sim._kmeans_centroids_fold(df, k=k, iters=iters).collect()
    }
    fold_s = (time.monotonic() - t0) / iters

    assert arrow == fold, (sorted(arrow), sorted(fold))
    print(
        json.dumps(
            {
                "n": n,
                "dim": dim,
                "k": k,
                "iters": iters,
                "arrow_sec_per_iter": round(arrow_s, 2),
                "fold_sec_per_iter": round(fold_s, 2),
                "speedup": round(fold_s / arrow_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
