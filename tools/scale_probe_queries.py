"""Query-level scale probe: materialize an 8×-fact replica of the
testdata star under /tmp (fact keys stride-shifted so they stay unique;
dimension keys untouched so foreign keys still resolve — the realistic
scale-up shape: facts grow, dims don't), then time REGISTRY queries at
1× and 8× and print the ratio. The cheap local evidence for whether a
query's cost curve would survive a real scale-up; readings recorded in
BASELINE.md.

Usage: python tools/scale_probe_queries.py q1 q2 ...  [--sf SF_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

REPLICAS = 8
ID_STRIDE = 100_000_000

# fact tables and which of their columns are FACT-side keys to shift;
# foreign keys into dims (suppkey/partkey/nationkey/custkey) stay put.
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate(d: DataFrame, shift_cols: list[str]) -> DataFrame:
    out = d
    for i in range(1, REPLICAS):
        r = d
        for c in shift_cols:
            r = r.withColumn(c, F.col(c) + i * ID_STRIDE)
        out = out.unionByName(r)
    return out


def build_scaled_dir(spark, sf_dir: str, out_dir: str) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t in DIMS:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in FACTS.items():
        d = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        # one parquet FILE per table (the testdata layout load_table
        # expects); repartition keeps the write parallel until the sink
        replicate(d, keys).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def timed(fn, spark) -> float:
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    # consume flags WITH their values so a flag value is never
    # misparsed as a positional query name
    argv, args, sf_dir = sys.argv[1:], [], "/root/testdata/sf0.1"
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            if i + 1 >= len(argv):
                raise SystemExit("--sf requires a directory argument")
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i].startswith("--"):
            raise SystemExit(f"unknown flag: {argv[i]}")
        else:
            args.append(argv[i])
            i += 1
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark import queries as qmod

    spark = get_spark("scale-probe-q")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = qmod.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out_dir = "/tmp/spark_graft_scale8"
    marker = os.path.join(out_dir, f".built_from_{os.path.basename(sf_dir)}")
    if not os.path.exists(marker):
        print(f"building {REPLICAS}x replica under {out_dir} ...")
        build_scaled_dir(spark, sf_dir, out_dir)
        open(marker, "w").write("ok")
    for name in args:
        t1 = timed(lambda: qs[name](spark, sf_dir), spark)
        t8 = timed(lambda: qs[name](spark, out_dir), spark)
        ratio = round(t8 / t1, 2) if t1 else float("nan")
        verdict = "SUBLINEAR" if ratio <= REPLICAS else "SUPERLINEAR"
        print(f"{name:30s} 1x={t1:6.2f}s  8x={t8:6.2f}s  ratio={ratio:5.2f}  {verdict}")


if __name__ == "__main__":
    main()
