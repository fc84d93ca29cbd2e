"""Scale probe: time selected operators on sf0.1 documents at 1× and on
an 8× self-replicated union (disjoint id spaces), printing the ratio —
the cheap local evidence for whether an operator's cost curve would
survive a real scale-up. See BASELINE.md "Scale probe" for readings.

Usage: python tools/scale_probe.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

REPLICAS = 8
ID_STRIDE = 10_000_000


def replicate(d: DataFrame, id_col: str) -> DataFrame:
    out = d
    for i in range(1, REPLICAS):
        out = out.unionByName(
            d.withColumn(id_col, F.col(id_col) + i * ID_STRIDE)
        )
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn().write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from core_telecoms_etl_spark import get_spark
    from core_telecoms_etl_spark.operators import dedup as dd
    from core_telecoms_etl_spark.operators import text as tx
    from core_telecoms_etl_spark.operators.packing import (
        deterministic_shuffle,
        pack_sequences,
    )

    spark = get_spark("scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs8 = replicate(docs, "doc_id")

    def contamination(d: DataFrame):
        return lambda: dd.contamination_pairs(
            d.filter(F.col("doc_id") >= 25),
            docs.filter(F.col("doc_id") < 25),
            "doc_id",
            "text",
            n=5,
        )

    def quality(d: DataFrame):
        scored = d.select(
            "doc_id", tx.quality_score("text").alias("q")
        )
        return lambda: tx.quality_quantile_filter(scored, "q", 0.25)

    def shuffle(d: DataFrame):
        ids = d.select("doc_id")
        return lambda: deterministic_shuffle(ids, "doc_id")

    def pack(d: DataFrame):
        counted = d.select(
            "doc_id", tx.token_count("text").alias("n_tokens")
        )
        return lambda: pack_sequences(counted, "doc_id", "n_tokens")

    def surprisal(d: DataFrame):
        from core_telecoms_etl_spark.queries.text import bigram_surprisal

        # the query loads its own table; rebuild the same plan over `d`
        def run():
            toks = d.select(
                "doc_id", tx.tokens("text").alias("ts")
            ).filter(F.size("ts") >= 2)
            bg = toks.select(
                "doc_id",
                F.explode(
                    F.expr(
                        "zip_with(slice(ts, 1, size(ts) - 1),"
                        "         slice(ts, 2, size(ts) - 1),"
                        "         (a, b) -> concat(a, ' ', b))"
                    )
                ).alias("bigram"),
            ).withColumn("w1", F.substring_index("bigram", " ", 1))
            bc = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
            uc = bg.groupBy("w1").agg(F.count("*").alias("c1"))
            vocab = uc.agg(F.count("*").alias("vocab"))
            return (
                bg.join(bc, "bigram")
                .join(uc, "w1")
                .crossJoin(F.broadcast(vocab))
                .groupBy("doc_id")
                .agg(
                    F.count("*").alias("n_bigrams"),
                    F.avg(
                        -F.log(
                            (F.col("c2") + 1).cast("double")
                            / (F.col("c1") + F.col("vocab"))
                        )
                    ).alias("surprisal"),
                )
            )

        _ = bigram_surprisal  # parity anchor: same plan as the query
        return run

    def cms(d: DataFrame):
        from core_telecoms_etl_spark.operators import sketches as sk

        def run():
            toks = d.select(F.explode(tx.tokens("text")).alias("token"))
            counters = sk.cms_build(toks, "token", depth=4, width=8192)
            top = (
                toks.groupBy("token")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "token")
                .limit(20)
            )
            return sk.cms_estimate(counters, top, "token", width=8192)

        return run

    def segdedup(d: DataFrame):
        return lambda: dd.segment_dedup(
            d, "doc_id", "text", seg_tokens=10, max_df=2
        )

    # -- r6 stats family: probed on the events/lineitem tables --------
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev8 = events
    for i in range(1, REPLICAS):
        ev8 = ev8.unionByName(
            events.withColumn(
                "user_id", F.col("user_id") + i * ID_STRIDE
            ).withColumn("event_id", F.col("event_id") + i * ID_STRIDE)
        )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li8 = replicate(lineitem, "l_orderkey")

    def anomaly(d: DataFrame):
        from core_telecoms_etl_spark.operators.temporal import (
            rolling_zscore_anomaly,
        )

        return lambda: rolling_zscore_anomaly(d)

    def ks(d: DataFrame):
        from core_telecoms_etl_spark.operators.stats import ks_two_sample

        return lambda: ks_two_sample(
            d,
            value_col="value",
            group_col="event_type",
            group_a="purchase",
            group_b="click",
        )

    def copurchase(d: DataFrame):
        def run():
            baskets = d.groupBy("l_orderkey").agg(
                F.sort_array(F.collect_set("l_partkey")).alias("__parts")
            )
            return (
                baskets.select(
                    F.posexplode("__parts").alias("__i", "part_a"),
                    "__parts",
                )
                .select(
                    "part_a",
                    F.explode(
                        F.slice(
                            "__parts",
                            F.col("__i") + 2,
                            F.greatest(
                                F.size("__parts") - F.col("__i") - 1,
                                F.lit(0),
                            ),
                        )
                    ).alias("part_b"),
                )
                .groupBy("part_a", "part_b")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "part_a", "part_b")
                .limit(50)
            )

        return run

    for name, mk, one, eight in [
        ("rolling_anomaly", anomaly, events, ev8),
        ("ks_two_sample", ks, events, ev8),
        ("copurchase_pairs", copurchase, lineitem, li8),
    ]:
        spark.catalog.clearCache()
        timed(mk(one))
        spark.catalog.clearCache()
        t1 = timed(mk(one))
        spark.catalog.clearCache()
        t8 = timed(mk(eight))
        print(f"{name}: 1x={t1}s 8x={t8}s ratio={round(t8 / t1, 1)}x")

    for name, mk in [
        ("contamination", contamination),
        ("quality_filter", quality),
        ("deterministic_shuffle", shuffle),
        ("sequence_pack", pack),
        ("bigram_surprisal", surprisal),
        ("cms_heavy_hitters", cms),
        ("segment_dedup", segdedup),
    ]:
        # untimed warmup strips one-time codegen/compile cost so the
        # printed ratio isolates the data-size scaling
        spark.catalog.clearCache()
        timed(mk(docs))
        spark.catalog.clearCache()
        t1 = timed(mk(docs))
        spark.catalog.clearCache()
        t8 = timed(mk(docs8))
        print(f"{name}: 1x={t1}s 8x={t8}s ratio={round(t8 / t1, 1)}x")


if __name__ == "__main__":
    main()
