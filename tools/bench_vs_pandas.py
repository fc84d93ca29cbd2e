"""Head-to-head throughput: the engine's cleaning chain on Spark vs a
faithful re-implementation of the reference's single-process pandas
cleaning (rename → dropna(all) → drop_duplicates → per-column strip,
plugins/transform.py:85-114) over the same parquet input.

The reference's compute model is one pandas process per file; ours is a
multi-core Spark plan. This records both at sf0.1 and at 8× that size so
the crossover is visible.

Usage: python tools/bench_vs_pandas.py [SF_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pandas_clean(df: pd.DataFrame) -> pd.DataFrame:
    # faithful to plugins/transform.py:85-114 (rename handled upstream)
    df = df.dropna(how="all")
    df = df.drop_duplicates()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].apply(
                lambda x: x.strip() if isinstance(x, str) else x
            )
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = f"{sf_dir}/lineitem.parquet"

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators.cleaning import clean

    spark = get_spark("bench-vs-pandas")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
    # warm codegen + file listing for the clean plan itself (untimed)
    clean(spark.read.parquet(path)).write.mode("overwrite").format(
        "noop"
    ).save()

    results = {}
    for mult in (1, 8):
        # pandas (single process, like the reference's worker)
        t0 = time.time()
        pdf = pd.read_parquet(path)
        if mult > 1:
            pdf = pd.concat([pdf] * mult, ignore_index=True)
            t0 = time.time()  # don't bill the synthetic inflation
        out = pandas_clean(pdf)
        n_rows = len(out)
        pandas_sec = round(time.time() - t0, 2)

        # spark: same logical chain, one lazy plan, noop sink
        df = spark.read.parquet(path)
        if mult > 1:
            base = df
            for _ in range(mult - 1):
                df = df.unionByName(base)
        t0 = time.time()
        clean(df).write.mode("overwrite").format("noop").save()
        spark_sec = round(time.time() - t0, 2)
        results[f"{mult}x"] = {
            "rows_in": 600_000 * mult * 10 // 10,
            "rows_out": n_rows,
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(json.dumps({"metric": "clean_chain_vs_pandas", "results": results}))


if __name__ == "__main__":
    main()
