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

    # -- r6: the rolling-anomaly op vs the same algorithm in pandas
    # (groupby/rolling — the natural single-process formulation the
    # reference's worker model would reach for)
    ev_path = f"{sf_dir}/events.parquet"

    def pandas_anomaly(pdf: pd.DataFrame) -> int:
        look, minp, zt = 20, 10, 3
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        v = (pdf["value"] * 100).round().astype("int64")
        g = v.groupby(pdf["user_id"])
        # trailing window EXCLUDING the current row
        n = g.transform(lambda s: s.rolling(look, min_periods=1).count().shift(1)).fillna(0)
        s = g.transform(lambda s: s.rolling(look, min_periods=1).sum().shift(1)).fillna(0)
        ss = g.transform(lambda s: (s * s).rolling(look, min_periods=1).sum().shift(1)).fillna(0)
        dev = n * v - s
        flag = (n >= minp) & (dev * dev > zt * zt * (n * ss - s * s))
        return int(flag.sum())

    from core_telecoms_etl_spark.operators.temporal import (
        rolling_zscore_anomaly,
    )

    anomaly_results = {}
    for mult in (1, 8):
        pdf = pd.read_parquet(ev_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["user_id"] += i * 10_000_000
                p["event_id"] += i * 10_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        n_flagged = pandas_anomaly(pdf)
        pandas_sec = round(time.time() - t0, 2)

        from pyspark.sql import functions as F

        df = spark.read.parquet(ev_path)
        if mult > 1:
            base = df
            for i in range(1, mult):
                df = df.unionByName(
                    base.withColumn(
                        "user_id", F.col("user_id") + i * 10_000_000
                    ).withColumn(
                        "event_id", F.col("event_id") + i * 10_000_000
                    )
                )
        plan = rolling_zscore_anomaly(df)
        plan.write.mode("overwrite").format("noop").save()  # warm, untimed
        t0 = time.time()
        spark_flagged = plan.count()
        spark_sec = round(time.time() - t0, 2)
        assert spark_flagged == n_flagged, (spark_flagged, n_flagged)
        anomaly_results[f"{mult}x"] = {
            "flagged": n_flagged,
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {
                "metric": "rolling_anomaly_vs_pandas",
                "results": anomaly_results,
            }
        )
    )


    # -- r7: last-touch attribution vs the same algorithm in pandas
    # (sort + groupby-ffill — the single-process formulation)
    def pandas_attribution(pdf: pd.DataFrame) -> dict:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        ch = pdf["event_type"].where(pdf["event_type"] != "purchase")
        pdf = pdf.assign(
            channel=ch.groupby(pdf["user_id"]).ffill().fillna("direct"),
            cents=(pdf["value"] * 100).round().astype("int64"),
        )
        pur = pdf[pdf["event_type"] == "purchase"]
        g = pur.groupby("channel").agg(
            n=("channel", "size"), cents=("cents", "sum")
        )
        return {
            str(k): (int(r.n), int(r.cents)) for k, r in g.iterrows()
        }

    from core_telecoms_etl_spark.queries.events import (
        attribution_last_touch,
    )
    from pyspark.sql import functions as F

    attrib_results = {}
    # attribution is cheap enough per row that pandas' vectorized
    # ffill wins until well past 8x - probe to 64x for the crossover
    for mult in (1, 8, 64):
        pdf = pd.read_parquet(ev_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["user_id"] += i * 10_000_000
                p["event_id"] += i * 10_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        expect = pandas_attribution(pdf)
        pandas_sec = round(time.time() - t0, 2)

        if mult == 1:
            src_dir = sf_dir
        else:
            src_dir = f"/tmp/spark_graft_attrib{mult}"
            if not os.path.exists(f"{src_dir}/events.parquet"):
                os.makedirs(src_dir, exist_ok=True)
                base = spark.read.parquet(ev_path)
                df = base
                for i in range(1, mult):
                    df = df.unionByName(
                        base.withColumn(
                            "user_id", F.col("user_id") + i * 10_000_000
                        ).withColumn(
                            "event_id", F.col("event_id") + i * 10_000_000
                        )
                    )
                df.repartition(32).write.mode("overwrite").parquet(
                    f"{src_dir}/events.parquet"
                )
        plan = attribution_last_touch(spark, src_dir)
        plan.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        rows = plan.collect()
        spark_sec = round(time.time() - t0, 2)
        got = {
            r.channel: (
                r.n_purchases,
                int(round(r.attributed_value * 100)),
            )
            for r in rows
        }
        assert got == expect, (got, expect)
        attrib_results[f"{mult}x"] = {
            "channels": len(got),
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {
                "metric": "attribution_vs_pandas",
                "results": attrib_results,
            }
        )
    )

    # -- r8: Mann-Whitney U vs the natural pandas formulation
    # (rank(method='average') over the pooled values — one process,
    # one global sort; the engine builds the same statistic from
    # per-value counts + a two-level bucketed prefix sum)
    def pandas_mw(pdf: pd.DataFrame) -> int:
        f = pdf[
            pdf["event_type"].isin(["click", "purchase"])
            & pdf["value"].notna()
        ]
        r = f["value"].rank(method="average")
        na = int((f["event_type"] == "click").sum())
        s2r = int(round((2 * r[f["event_type"] == "click"]).sum()))
        return s2r - na * (na + 1)  # u2_scaled

    from core_telecoms_etl_spark.operators.stats import mann_whitney_u

    mw_results = {}
    for mult in (1, 8):
        pdf = pd.read_parquet(ev_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["user_id"] += i * 10_000_000
                p["event_id"] += i * 10_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        expect_u2 = pandas_mw(pdf)
        pandas_sec = round(time.time() - t0, 2)

        df = spark.read.parquet(ev_path)
        if mult > 1:
            base = df
            for i in range(1, mult):
                df = df.unionByName(
                    base.withColumn(
                        "user_id", F.col("user_id") + i * 10_000_000
                    ).withColumn(
                        "event_id", F.col("event_id") + i * 10_000_000
                    )
                )
        plan = mann_whitney_u(
            df,
            value_col="value",
            group_col="event_type",
            group_a="click",
            group_b="purchase",
        )
        plan.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        row = plan.collect()[0]
        spark_sec = round(time.time() - t0, 2)
        assert row.u2_scaled == expect_u2, (row.u2_scaled, expect_u2)
        mw_results[f"{mult}x"] = {
            "u2_scaled": expect_u2,
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {"metric": "mann_whitney_vs_pandas", "results": mw_results}
        )
    )

    # -- r8: triangle census vs the best honest single-process
    # formulation (pandas self-merge for co-purchase edges, then the
    # same degree-ordered edge-iterator with dict-of-sets adjacency —
    # NOT the naive wedge merge, which materializes the 148M-wedge
    # relation and would strawman the comparison)
    li_path = f"{sf_dir}/lineitem.parquet"

    def pandas_triangles(pdf: pd.DataFrame) -> int:
        pl = pdf[["l_orderkey", "l_partkey"]].drop_duplicates()
        pairs = pl.merge(pl, on="l_orderkey")
        pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
        e = pairs[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        deg: dict = {}
        for v in pd.concat([e["l_partkey_x"], e["l_partkey_y"]]):
            deg[v] = deg.get(v, 0) + 1
        adj: dict = {}
        edges = []
        for a, b in zip(e["l_partkey_x"], e["l_partkey_y"]):
            lo, hi = ((a, b) if (deg[a], a) < (deg[b], b) else (b, a))
            adj.setdefault(lo, set()).add(hi)
            edges.append((lo, hi))
        t = 0
        empty: set = set()
        for lo, hi in edges:
            t += len(adj[lo] & adj.get(hi, empty))
        return t

    from core_telecoms_etl_spark.queries.analytics import triangle_count

    tri_results = {}
    for mult in (1, 8):
        pdf = pd.read_parquet(li_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["l_orderkey"] += i * 100_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        expect_t = pandas_triangles(pdf)
        pandas_sec = round(time.time() - t0, 2)

        if mult == 1:
            src_dir = sf_dir
        else:
            src_dir = f"/tmp/spark_graft_tri{mult}"
            if not os.path.exists(f"{src_dir}/lineitem.parquet"):
                os.makedirs(src_dir, exist_ok=True)
                base = spark.read.parquet(li_path)
                df = base
                for i in range(1, mult):
                    df = df.unionByName(
                        base.withColumn(
                            "l_orderkey",
                            F.col("l_orderkey") + i * 100_000_000,
                        )
                    )
                df.repartition(32).write.mode("overwrite").parquet(
                    f"{src_dir}/lineitem.parquet"
                )
        plan = triangle_count(spark, src_dir)
        plan.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        row = plan.collect()[0]
        spark_sec = round(time.time() - t0, 2)
        assert row.n_triangles == expect_t, (row.n_triangles, expect_t)
        tri_results[f"{mult}x"] = {
            "n_triangles": expect_t,
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {"metric": "triangle_census_vs_pandas", "results": tri_results}
        )
    )

    # -- r9: kNN-classify readout vs the natural single-process
    # formulation (numpy BLAS matmul cosine + majority vote — the best
    # honest one-core exact kNN; the Spark side is the Arrow-batched
    # distributed scorer + the same vote). Predictions asserted EQUAL.
    import numpy as np

    emb_path = f"{sf_dir}/embeddings.parquet"

    def pandas_knn(pdf: pd.DataFrame) -> dict:
        ids = pdf["vec_id"].to_numpy(np.int64)
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        lab = pdf["label"].to_numpy()
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        qm = ids % 20 == 0
        Q, C = M[qm], M[~qm]
        qid, nid, nlab = ids[qm], ids[~qm], lab[~qm]
        cos = Q @ C.T
        preds = {}
        for j in range(len(qid)):
            sel = np.lexsort((nid, -cos[j]))[:10]
            votes: dict = {}
            for l in nlab[sel]:
                votes[l] = votes.get(l, 0) + 1
            preds[int(qid[j])] = min(
                votes, key=lambda l: (-votes[l], l)
            )
        return preds

    from core_telecoms_etl_spark.operators import similarity as sim
    from core_telecoms_etl_spark.queries.vector import _majority_vote

    knn_results = {}
    for mult in (1, 8):
        pdf = pd.read_parquet(emb_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["vec_id"] += i * 10_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        expect = pandas_knn(pdf)
        pandas_sec = round(time.time() - t0, 2)

        df = spark.read.parquet(emb_path)
        if mult > 1:
            base = df
            for i in range(1, mult):
                df = df.unionByName(
                    base.withColumn(
                        "vec_id", F.col("vec_id") + i * 10_000_000
                    )
                )
        q = df.filter(F.col("vec_id") % 20 == 0)
        c = df.filter(F.col("vec_id") % 20 != 0)
        labels = df.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nlab"),
        )
        plan = _majority_vote(sim.brute_force_topk(c, q, k=10), labels)
        plan.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        got = {int(r.query_id): int(r.pred) for r in plan.collect()}
        spark_sec = round(time.time() - t0, 2)
        assert got == expect, (
            len(got),
            len(expect),
            {k: (got.get(k), expect.get(k)) for k in list(expect)[:3]},
        )
        knn_results[f"{mult}x"] = {
            "n_queries": len(expect),
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {"metric": "knn_readout_vs_pandas", "results": knn_results}
        )
    )

    # -- r9: sliding-window p50 vs the natural pandas formulation
    # (per-day trailing-7d EXACT quantile — each window re-sorts its raw
    # values; the Spark side merges the per-day KLL sketches over a
    # RANGE window, never touching fact rows twice). The engine's
    # estimate is asserted inside the exact ±0.04 rank band the
    # declared query flags, and the 7-day event totals asserted EQUAL.
    def pandas_sliding_p50(pdf: pd.DataFrame) -> dict:
        pdf = pdf.assign(day=pdf["ts"].dt.normalize())
        days = sorted(pdf["day"].unique())
        by_day = {d: g["value"].to_numpy() for d, g in pdf.groupby("day")}
        out = {}
        for d in days:
            vals = np.concatenate(
                [
                    by_day[d2]
                    for d2 in days
                    if 0 <= (d - d2).days <= 6
                ]
            )
            vals.sort()
            # same linear interpolation as Spark's percentile()
            lo = np.percentile(vals, 46)
            hi = np.percentile(vals, 54)
            out[pd.Timestamp(d).date()] = (len(vals), lo, hi)
        return out

    from core_telecoms_etl_spark.operators import sketches as sk

    kll_results = {}
    for mult in (1, 8):
        pdf = pd.read_parquet(ev_path)
        if mult > 1:
            parts = [pdf]
            for i in range(1, mult):
                p = pdf.copy()
                p["event_id"] += i * 10_000_000
                parts.append(p)
            pdf = pd.concat(parts, ignore_index=True)
        t0 = time.time()
        expect_b = pandas_sliding_p50(pdf)
        pandas_sec = round(time.time() - t0, 2)

        df = spark.read.parquet(ev_path)
        if mult > 1:
            base = df
            for i in range(1, mult):
                df = df.unionByName(
                    base.withColumn(
                        "event_id", F.col("event_id") + i * 10_000_000
                    )
                )
        from pyspark.sql import Window

        from core_telecoms_etl_spark.functions import expressions as xp

        daily = (
            df.withColumn("day", F.col("ts").cast("date"))
            .groupBy("day")
            .agg(
                F.expr("kll_sketch_agg_double(value)").alias("sk"),
                F.count("*").alias("n"),
            )
            .withColumn(
                "dn",
                F.datediff(
                    F.col("day"), F.lit("1970-01-01").cast("date")
                ).cast("long"),
            )
        )
        w = (
            Window.partitionBy(xp.single_partition("dn"))
            .orderBy("dn")
            .rangeBetween(-6, 0)
        )
        plan = daily.select(
            "day",
            F.sum("n").over(w).cast("long").alias("n7"),
            F.expr("kll_merge_agg_double(sk)").over(w).alias("__m"),
        ).select(
            "day",
            "n7",
            F.expr("kll_sketch_get_quantile_double(__m, 0.5)").alias(
                "p50_est"
            ),
        )
        plan.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        got = {r.day: (r.n7, r.p50_est) for r in plan.collect()}
        spark_sec = round(time.time() - t0, 2)
        assert set(got) == set(expect_b)
        for d, (n7, est) in got.items():
            n_x, lo, hi = expect_b[d]
            assert n7 == n_x, (d, n7, n_x)
            assert lo <= est <= hi, (d, est, lo, hi)
        kll_results[f"{mult}x"] = {
            "n_windows": len(got),
            "pandas_sec": pandas_sec,
            "spark_sec": spark_sec,
            "speedup": round(pandas_sec / max(spark_sec, 0.01), 2),
        }
    print(
        json.dumps(
            {
                "metric": "sliding_p50_vs_pandas",
                "results": kll_results,
            }
        )
    )


if __name__ == "__main__":
    main()
