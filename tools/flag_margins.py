"""Flag-margin report: every tolerance/recall flag the driver checks is
a hardcoded `1` in its oracle, so a drift past the floor surfaces as a
hash mismatch (the hll_sliding_distinct caveat, r7 ADVICE). This tool
measures HOW FAR each flag currently sits from its threshold, per
scale, so a shrinking margin is visible rounds before it goes red.

Usage: python tools/flag_margins.py [SF_DIR ...]
Prints one JSON line per scale: {query: {"margin": float, ...}} where
margin is normalized headroom in [0, 1]-ish units (0 = at threshold).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def margins_for(spark, sf_dir: str) -> dict:
    from core_telecoms_etl_spark.operators import similarity as sim
    from core_telecoms_etl_spark.sources.readers import load_table

    out: dict[str, dict] = {}
    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")

    # hll_sliding_distinct: flag |approx-exact|/exact <= 0.05
    daily = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .withColumn(
            "dn",
            F.datediff(
                F.col("day"), F.lit("1970-01-01").cast("date")
            ).cast("long"),
        )
    )
    from pyspark.sql import Window

    from core_telecoms_etl_spark.functions import expressions as xp

    w = (
        Window.partitionBy(xp.single_partition("dn"))
        .orderBy("dn")
        .rangeBetween(-6, 0)
    )
    est = daily.select(
        "day", F.expr("hll_union_agg(sk)").over(w).alias("m")
    ).select("day", F.expr("hll_sketch_estimate(m)").alias("approx"))
    ex = (
        daily.select("day")
        .join(
            ev.select(F.col("ts").cast("date").alias("d2"), "user_id"),
            (F.col("d2") >= F.date_sub(F.col("day"), 6))
            & (F.col("d2") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact"))
    )
    r = (
        est.join(ex, "day")
        .select(
            (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")).alias(
                "err"
            )
        )
        .agg(F.max("err"))
        .collect()[0][0]
    )
    out["hll_sliding_distinct"] = {
        "max_rel_err": round(float(r), 5),
        "threshold": 0.05,
        "margin": round(1 - float(r) / 0.05, 3),
    }

    # kll_sliding_quantile: merged p50 must land in the exact 0.46-0.54
    # rank band; margin = min distance of the estimate's true rank from
    # either band edge, in rank units / band half-width
    kll_est = daily_kll_est(spark, ev)
    out["kll_sliding_quantile"] = kll_est

    # knn_classify_ivf: per-query recall floor 0.5, vote agreement 0.7
    q = emb.filter(F.col("vec_id") % 20 == 0)
    c = emb.filter(F.col("vec_id") % 20 != 0)
    approx = sim.ivf_topk(
        c, q, k=10, n_centroids=16, n_probe=12, kmeans_iters=2
    )
    exact = sim.brute_force_topk(c, q, k=10)
    hit = approx.select("query_id", "neighbor_id").withColumn(
        "h", F.lit(1)
    )
    rec = (
        exact.select("query_id", "neighbor_id")
        .join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            (F.sum(F.coalesce("h", F.lit(0))) / F.count("*")).alias("r")
        )
        .agg(F.min("r"))
        .collect()[0][0]
    )
    from core_telecoms_etl_spark.queries.vector import _majority_vote

    labels = c.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlab")
    )
    pa = _majority_vote(approx, labels).withColumnRenamed("pred", "pa")
    pe = _majority_vote(exact, labels).withColumnRenamed("pred", "pe")
    ag = (
        pa.join(pe, "query_id")
        .agg(F.avg((F.col("pa") == F.col("pe")).cast("double")))
        .collect()[0][0]
    )
    out["knn_classify_ivf"] = {
        "min_recall": round(float(rec), 3),
        "recall_floor": 0.5,
        "vote_agreement": round(float(ag), 3),
        "agreement_floor": 0.7,
        "margin": round(
            min(
                (float(rec) - 0.5) / 0.5,
                (float(ag) - 0.7) / 0.3,
            ),
            3,
        ),
    }

    # vector_topk_ivf / _lsh: recall floor 0.8 over the 8 query vecs
    from core_telecoms_etl_spark.queries.vector import N_QUERY_VECS

    q8 = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    for name, topk in (
        (
            "vector_topk_ivf",
            sim.ivf_topk(
                emb, q8, k=10, n_centroids=16, n_probe=6, kmeans_iters=2
            ),
        ),
        (
            "vector_topk_lsh",
            sim.lsh_topk(
                emb, q8, k=10, n_bits=16, max_hamming=6, n_tables=4
            ),
        ),
    ):
        ex8 = sim.brute_force_topk(emb, q8, k=10)
        h = topk.select("query_id", "neighbor_id").withColumn(
            "h", F.lit(1)
        )
        mr = (
            ex8.select("query_id", "neighbor_id")
            .join(h, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                (F.sum(F.coalesce("h", F.lit(0))) / F.count("*")).alias(
                    "r"
                )
            )
            .agg(F.min("r"))
            .collect()[0][0]
        )
        out[name] = {
            "min_recall": round(float(mr), 3),
            "floor": 0.8,
            "margin": round((float(mr) - 0.8) / 0.2, 3),
        }
    return out


def daily_kll_est(spark, ev) -> dict:
    from pyspark.sql import Window

    from core_telecoms_etl_spark.functions import expressions as xp

    daily = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .agg(F.expr("kll_sketch_agg_double(value)").alias("sk"))
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
    est = daily.select(
        "day", F.expr("kll_merge_agg_double(sk)").over(w).alias("m")
    ).select(
        "day", F.expr("kll_sketch_get_quantile_double(m, 0.5)").alias("q50")
    )
    vals = ev.select(F.col("ts").cast("date").alias("d2"), "value")
    grid = daily.select("day")
    joined = grid.join(
        vals,
        (F.col("d2") >= F.date_sub(F.col("day"), 6))
        & (F.col("d2") <= F.col("day")),
    )
    # true rank of the estimate within each window's values
    ranked = (
        joined.join(est, "day")
        .groupBy("day")
        .agg(
            (
                F.sum((F.col("value") <= F.col("q50")).cast("long"))
                / F.count("*")
            ).alias("rank_frac")
        )
        .select(
            F.min(
                F.least(
                    F.col("rank_frac") - F.lit(0.46),
                    F.lit(0.54) - F.col("rank_frac"),
                )
            ).alias("min_edge_dist")
        )
        .collect()[0][0]
    )
    return {
        "min_rank_distance_to_band_edge": round(float(ranked), 4),
        "band_half_width": 0.04,
        "margin": round(float(ranked) / 0.04, 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from core_telecoms_etl_spark import get_spark

    spark = get_spark("flag-margins")
    for d in dirs:
        print(json.dumps({"sf_dir": d, "margins": margins_for(spark, d)}))


if __name__ == "__main__":
    main()
