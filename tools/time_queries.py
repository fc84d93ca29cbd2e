"""Minimal per-query timer for alternating-process A/B runs.

One process = one timing pass over the named queries in THIS checkout:
warmed session (range job + per-table counts + pandas-UDF worker spin),
per-query cache clear, build once / noop-sink N times, min + median to
one stdout JSON line. Run it alternately from the live repo and a
pre-change clone (`git clone /root/repo /tmp/repo_old && git -C
/tmp/repo_old checkout <sha>`), take the min across rounds of min-of-N
per side — the box-drift-proof comparison protocol (BASELINE.md /
box-steal notes).

Usage: python tools/time_queries.py q1 q2 ... [--sf SF_DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark import queries as qmod
    from core_telecoms_etl_spark.sources.readers import (
        TESTDATA_TABLES,
        load_table,
    )

    spark = get_spark("time-queries")
    qs = qmod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    from pyspark.sql.functions import pandas_udf

    warm_udf = pandas_udf(lambda v: v * 1.0, "double")
    spark.range(10_000).select(warm_udf("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        runs: list[float] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        runs.sort()
        out[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
