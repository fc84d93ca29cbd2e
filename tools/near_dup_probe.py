"""Near-dup family probe (VERDICT r8 ask #6 / r9 ask #5): one clean
min-of-3 table for the text near-dup operators at 1× (sf0.1 documents)
and 8× (self-replicated, disjoint id spaces) — also the post-fix check
that the r9 exact-rational prefix bound didn't move the probe numbers.

Run on an IDLE box (the r9 numbers were polluted by sweep contention).
Readings recorded in BASELINE.md "Round-10 session".

Usage: python tools/near_dup_probe.py [SF_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

REPLICAS = 8
ID_STRIDE = 10_000_000


def replicate(d: DataFrame) -> DataFrame:
    out = d
    for i in range(1, REPLICAS):
        out = out.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + i * ID_STRIDE)
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import dedup as dd

    spark = get_spark("near-dup-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs8 = replicate(docs)

    probes = {
        # the four operators the ask names, at the registered queries'
        # geometries (n=3 shingles; thresholds as declared)
        "near_dedup_minhash": lambda d: dd.minhash_lsh_pairs(
            d, "doc_id", "text", n=3, k=64, bands=16, est_threshold=0.7
        ),
        "exact_jaccard": lambda d: dd.jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.8
        ),
        "prefix_filter": lambda d: dd.prefix_filter_pairs(
            d, "doc_id", "text", n=3, threshold=0.8
        ),
        "containment": lambda d: dd.containment_pairs(
            d, "doc_id", "text", n=3, threshold=0.9
        ),
        "layered": lambda d: dd.layered_near_dup(
            d, "doc_id", "text", n=3, threshold=0.8
        ),
    }

    def timed_min3(mk, d: DataFrame) -> float:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            mk(d).write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        return round(min(runs), 2)

    results = {}
    for name, mk in probes.items():
        timed_min3(mk, docs)  # untimed warmup (codegen/compile)
        t1 = timed_min3(mk, docs)
        t8 = timed_min3(mk, docs8)
        results[name] = {
            "1x_sec": t1,
            "8x_sec": t8,
            "ratio": round(t8 / max(t1, 0.01), 1),
        }
        print(f"{name}: 1x={t1}s 8x={t8}s", file=sys.stderr)

    print(json.dumps({"metric": "near_dup_probe", "results": results}))


if __name__ == "__main__":
    main()
