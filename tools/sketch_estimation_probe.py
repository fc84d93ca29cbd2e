"""Deep-estimation-mode sketch accuracy probe.

The driver's theta/HLL oracle rows run at sf0.01 (below the sketch's
nominal-entries threshold → exact mode) and sf0.1 (just entering
estimation). This probe self-replicates the sf0.1 orders customer space
REPLICAS× with disjoint key strides, pushing the distinct counts far past
the theta sketch's 4096 nominal entries, and measures the set-operation
estimation errors against exact counts — the evidence behind the error
bounds quoted in `theta_sketch_setops`'s docstring (intersection /
difference error scales with the OPERAND sketches, so it is reported both
relative to the result and relative to |A|).

Usage: python tools/sketch_estimation_probe.py [SF_DIR]
Readings recorded in BASELINE.md "Sketch estimation-mode probe".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = 10
ID_STRIDE = 10_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.sources.readers import load_table

    spark = get_spark("sketch-estimation-probe")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus"
    )
    reps = o
    for i in range(1, REPLICAS):
        reps = reps.unionByName(
            o.withColumn("o_custkey", F.col("o_custkey") + i * ID_STRIDE)
        )
    reps = reps.cache()

    sk = reps.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'F' "
            "THEN o_custkey END)"
        ).alias("ska"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'O' "
            "THEN o_custkey END)"
        ).alias("skb"),
        F.expr(
            "hll_sketch_agg(CASE WHEN o_orderstatus = 'F' "
            "THEN o_custkey END)"
        ).alias("hla"),
    ).select(
        F.expr("theta_sketch_estimate(ska)").alias("ea"),
        F.expr("theta_sketch_estimate(skb)").alias("eb"),
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias("eu"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").alias(
            "ei"
        ),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").alias(
            "ed"
        ),
        F.expr("hll_sketch_estimate(hla)").alias("hll_a"),
    )
    per = reps.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "a"
        ),
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "b"
        ),
    )
    ex = per.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(
            F.when((F.col("a") == 1) | (F.col("b") == 1), 1).otherwise(0)
        ).alias("nu"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)
        ).alias("ni"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)
        ).alias("nd"),
    )
    r = sk.crossJoin(ex).collect()[0]

    def line(tag: str, est: float, exact: int, ref: int) -> None:
        rel = abs(est - exact) / exact if exact else float("nan")
        rel_a = abs(est - exact) / ref
        print(
            f"{tag:12s} exact={exact:>9d} est={est:>12.1f} "
            f"err_vs_result={rel:6.2%} err_vs_|A|={rel_a:6.2%}"
        )

    print(
        f"replicas={REPLICAS} -> |A|={r['na']} |B|={r['nb']} "
        f"(theta nominal entries 4096: deep estimation mode)"
    )
    line("A", r["ea"], r["na"], r["na"])
    line("B", r["eb"], r["nb"], r["na"])
    line("A∪B", r["eu"], r["nu"], r["na"])
    line("A∩B", r["ei"], r["ni"], r["na"])
    line("A∖B", r["ed"], r["nd"], r["na"])
    line("HLL |A|", r["hll_a"], r["na"], r["na"])

    # KLL deep-mode RANK error: estimate quantiles of a 10×-replicated
    # value column at the default k, then measure each estimate's true
    # rank displacement — the bound KLL states (±~1.7% rank at k=200)
    o2 = load_table(spark, sf_dir, "orders")
    vals = o2.select("o_totalprice")
    for i in range(1, REPLICAS):
        vals = vals.unionByName(
            o2.select((F.col("o_totalprice") + i * 0.01).alias("o_totalprice"))
        )
    vals = vals.cache()
    n = vals.count()
    qs = (0.5, 0.99)
    est = vals.agg(
        *[
            F.expr(
                "kll_sketch_get_quantile_double("
                f"kll_sketch_agg_double(o_totalprice), {q})"
            ).alias(f"q{int(q * 100)}")
            for q in qs
        ]
    ).collect()[0]
    for q in qs:
        v = est[f"q{int(q * 100)}"]
        true_rank = vals.filter(F.col("o_totalprice") <= v).count() / n
        print(
            f"KLL q{q:4}: est={v:12.2f} true_rank={true_rank:.4f} "
            f"rank_err={abs(true_rank - q):.4%} (n={n})"
        )


if __name__ == "__main__":
    main()
