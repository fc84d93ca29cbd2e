"""Aggregate-checksum differential for results too large to collect.

The standard `check_oracle` harness collects BOTH sides into pandas and
compares values exactly — the right gate at sf0.01..sf1, but a
grid-shaped result at sf10 (~420M rows for time_grid_fill: span-fixed
generator × 10× keys) cannot cross the driver at all. This tool keeps
the differential ENGINE-SIDE on both engines: it wraps the Spark query
and the DuckDB oracle in the same aggregate layer and compares the
scalars —

  - count(*)
  - per numeric column: sum (rounded to 6dp pre-sum on both sides),
    min, max, count of non-nulls
  - per string column: count distinct, min, max, count of non-nulls
  - per timestamp column: min, max, count distinct

A float sum over ~10^8 rows differs across engines only by
accumulation order; compare with rel-tol 1e-9 (both engines sum
float64 over the SAME rounded values — observed agreement is far
tighter; anything past 1e-9 is a real row difference, not order).

Usage: SF_DIR=/tmp/spark_graft_sf10 python tools/agg_checksum_compare.py \
           time_grid_fill time_grid_interpolate
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

REL_TOL = 1e-9


def spark_aggs(sdf):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for f in sdf.schema.fields:
        c, n = F.col(f.name), f.name
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.DecimalType)):
            aggs += [
                F.sum(F.round(c.cast("double"), 6)).alias(f"{n}__sum"),
                F.min(c.cast("double")).alias(f"{n}__min"),
                F.max(c.cast("double")).alias(f"{n}__max"),
                F.count(c).alias(f"{n}__nn"),
            ]
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            aggs += [
                F.sum(c.cast("long")).alias(f"{n}__sum"),
                F.min(c).alias(f"{n}__min"),
                F.max(c).alias(f"{n}__max"),
                F.count(c).alias(f"{n}__nn"),
            ]
        elif isinstance(f.dataType, T.StringType):
            aggs += [
                F.countDistinct(c).alias(f"{n}__nd"),
                F.min(c).alias(f"{n}__min"),
                F.max(c).alias(f"{n}__max"),
                F.count(c).alias(f"{n}__nn"),
            ]
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs += [
                F.countDistinct(c).alias(f"{n}__nd"),
                F.min(c).cast("string").alias(f"{n}__min"),
                F.max(c).cast("string").alias(f"{n}__max"),
            ]
    return {k: v for k, v in sdf.agg(*aggs).collect()[0].asDict().items()}


def duck_aggs(con, oracle: str, sdf_schema) -> dict:
    from pyspark.sql import types as T

    parts = ["count(*) AS n_rows"]
    for f in sdf_schema.fields:
        n = f.name
        q = f'"{n}"'
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.DecimalType)):
            parts += [
                f"sum(round(CAST({q} AS DOUBLE), 6)) AS {n}__sum",
                f"min(CAST({q} AS DOUBLE)) AS {n}__min",
                f"max(CAST({q} AS DOUBLE)) AS {n}__max",
                f"count({q}) AS {n}__nn",
            ]
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            parts += [
                f"sum(CAST({q} AS BIGINT)) AS {n}__sum",
                f"min({q}) AS {n}__min",
                f"max({q}) AS {n}__max",
                f"count({q}) AS {n}__nn",
            ]
        elif isinstance(f.dataType, T.StringType):
            parts += [
                f"count(DISTINCT {q}) AS {n}__nd",
                f"min({q}) AS {n}__min",
                f"max({q}) AS {n}__max",
                f"count({q}) AS {n}__nn",
            ]
        elif isinstance(
            f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            parts += [
                f"count(DISTINCT {q}) AS {n}__nd",
                f"CAST(min({q}) AS VARCHAR) AS {n}__min",
                f"CAST(max({q}) AS VARCHAR) AS {n}__max",
            ]
    sql = f"SELECT {', '.join(parts)} FROM ({oracle}) __t"
    row = con.execute(sql).fetchone()
    cols = [d[0] for d in con.description]
    return dict(zip(cols, row))


def _ts_norm(v: str) -> str:
    # "2024-01-01 00:00:00" == "2024-01-01 00:00:00.000000" etc.
    if isinstance(v, str) and " " in v:
        v = v.rstrip("0").rstrip(".") if "." in v else v
    return v


def compare(name: str, s: dict, o: dict) -> list[str]:
    problems = []
    for k, sv in s.items():
        ov = o.get(k)
        if isinstance(sv, float) or isinstance(ov, float):
            sv_f = float(sv) if sv is not None else math.nan
            ov_f = float(ov) if ov is not None else math.nan
            if math.isnan(sv_f) and math.isnan(ov_f):
                continue
            denom = max(abs(sv_f), abs(ov_f), 1.0)
            if abs(sv_f - ov_f) / denom > REL_TOL:
                problems.append(f"{k}: spark={sv!r} oracle={ov!r}")
        else:
            a, b = _ts_norm(sv), _ts_norm(ov)
            if a != b:
                problems.append(f"{k}: spark={sv!r} oracle={ov!r}")
    return problems


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark import queries as qmod

    spark = get_spark(
        "agg-checksum",
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    qs, oracles = qmod.queries(), qmod.oracle_sql()
    con = duckdb.connect(
        config={
            "memory_limit": "48GB",
            "temp_directory": "/tmp/duckdb_spill",
        }
    )
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name in sys.argv[1:]:
        sdf = qs[name](spark, sf_dir)
        t0 = time.time()
        s = spark_aggs(sdf)
        t_spark = time.time() - t0
        t0 = time.time()
        o = duck_aggs(con, oracles[name], sdf.schema)
        t_duck = time.time() - t0
        problems = compare(name, s, o)
        if problems:
            failures += 1
            print(f"FAIL {name}: ({s.get('n_rows')} spark rows)")
            for p in problems:
                print(f"     {p}")
        else:
            print(
                f"PASS {name}: {s['n_rows']} rows aggregate-checksum "
                f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
