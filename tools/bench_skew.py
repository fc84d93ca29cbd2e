"""Time plain vs salted vs AQE-skew-split on the skew corpus's hot key
(r14 verdict ask #2 — the salted paths had only ever been timed on
near-uniform keys where salting does no real work).

    python tools/make_skew_testdata.py /root/testdata/sf0.1 /tmp/skew_sf0.1
    SKEW_DIR=/tmp/skew_sf0.1 python tools/bench_skew.py

Two shapes, three strategies each, every strategy value-checked against
the plain run before its time is reported:

- JOIN  orders ⋈ customer on o_custkey (hot key 0 = ~20% of orders),
  reduced to a per-mktsegment rollup. Broadcast is DISABLED for all
  three strategies: at sf0.1 the customer dim broadcasts and no plan
  ever shuffles by the hot key — the measurement would be vacuous.
  The forced sort-merge models the big-dim regime (dim past the
  broadcast threshold), which is exactly where skew mitigation exists;
  when the dim fits the driver, `F.broadcast` IS the skew strategy.
    plain      AQE on, skew-split off  (the naive shuffle)
    aqe_skew   AQE skew-join split, thresholds sized to local data
    salted     operators/joins.salted_join, 16 salts
- AGG  events groupBy user_id (hot user 0 = ~20% of events), exact
  BIGINT cent sums (the salted_groupby determinism contract).
    plain      one-phase hash agg
    salted     operators/joins.salted_groupby two-phase, 16 salts

Prints one JSON line: {"sf_dir": ..., "join": {...}, "agg": {...}},
seconds per strategy (min of REPS passes, first pass discarded as
warm-up) plus the hot-key mass so the reading is self-describing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators.joins import salted_groupby, salted_join

REPS = int(os.environ.get("REPS", "3"))


def timed(fn):
    best = None
    for i in range(REPS + 1):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        if i > 0:  # first pass is warm-up (scan cache, codegen)
            best = dt if best is None else min(best, dt)
    return best, out


def main() -> None:
    sf_dir = os.environ.get("SKEW_DIR", "/tmp/spark_graft_skew")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    res: dict = {"sf_dir": sf_dir, "reps": REPS}
    res["hot_order_rows"] = orders.filter(F.col("o_custkey") == 0).count()
    res["orders_rows"] = orders.count()
    res["hot_event_rows"] = events.filter(F.col("user_id") == 0).count()
    res["events_rows"] = events.count()

    # ---- JOIN shape -----------------------------------------------------
    def set_join_confs(skew_split: bool) -> None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        if skew_split:
            # local-scale thresholds: default 256 MB/5x never trips on
            # a 20%-hot 100 MB shuffle; 1 MB/2x models the production
            # ratio (hot partition >> median) at this data size
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "1m",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
            )
        else:
            # RESET the skew-arm overrides (r15 self-review #2: the
            # first harness version left the 1m advisory set, so the
            # salted and agg arms ran with no post-shuffle coalescing
            # while the plain baseline had the 64 MB default — a
            # confounded comparison); every non-skew arm must see
            # stock AQE
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            ):
                spark.conf.unset(k)

    cust = customer.withColumnRenamed("c_custkey", "o_custkey")

    def rollup(joined):
        return (
            joined.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("cents"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )

    def plain_join():
        return rollup(orders.join(cust, "o_custkey"))

    def salted():
        return rollup(
            salted_join(
                orders, cust, "o_custkey", salt_from="o_orderkey",
                n_salts=16,
            )
        )

    join_res: dict = {}
    set_join_confs(skew_split=False)
    t, baseline = timed(plain_join)
    join_res["plain"] = round(t, 3)
    set_join_confs(skew_split=True)
    t, out = timed(plain_join)
    assert out == baseline, "aqe_skew join diverged from plain"
    join_res["aqe_skew"] = round(t, 3)
    set_join_confs(skew_split=False)
    t, out = timed(salted)
    assert out == baseline, "salted join diverged from plain"
    join_res["salted"] = round(t, 3)
    res["join"] = join_res

    # ---- AGG shape ------------------------------------------------------
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    ev = events.withColumn(
        "__cents", F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("long")
    )

    def plain_agg():
        return sorted(
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("__cents").alias("cents"))
            .collect()
        )

    def salted_agg():
        return sorted(
            salted_groupby(
                ev, ["user_id"], salt_from="event_id", n_salts=16,
                sums=["__cents"],
            )
            .withColumnRenamed("sum___cents", "cents")
            .collect()
        )

    agg_res: dict = {}
    t, abase = timed(plain_agg)
    agg_res["plain"] = round(t, 3)
    t, out = timed(salted_agg)
    assert out == abase, "salted agg diverged from plain"
    agg_res["salted"] = round(t, 3)
    res["agg"] = agg_res

    print(json.dumps(res))


if __name__ == "__main__":
    main()
