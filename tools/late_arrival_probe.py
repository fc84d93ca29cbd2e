"""A/B probe for late_arrival_audit's totals branch (VERDICT r15 #3).

Three forms of the same query (identical output, asserted here):

  current — the committed shape: the bucket-max table re-scans events
            (2-column pruned scan + broadcast span join + map-side
            partial max -> 256-row shuffle). The duplicate work is the
            cheapest possible second pass: a narrow scan, no wide
            shuffle, no sort.
  reuse   — derived-totals shape with PRUNE-ALIGNED branches: the
            bucket-max table aggregates the WINDOWED relation at
            (bkt, event_type) grain so both branches' exchange subtrees
            canonicalize identically and AQE ReusedExchange feeds the
            offsets branch from the window's own shuffle files (the
            fact is scanned and shuffled ONCE, but sorted + windowed
            twice); per-type totals come from the same tiny aggregate,
            late counts left-join back.
  pin     — cache_scoped the 4-column bucketed relation; both branches
            read the pin (one scan, plus |events| rows of
            MEMORY_AND_DISK executor storage).

Usage: python tools/late_arrival_probe.py [SF_DIR] [REPS]
Prints min/median per form over REPS interleaved rounds (noop sink,
cache cleared between reps) and asserts all three forms return
identical rows first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


N_BUCKETS = 256
DELAY_US = 3600000000


def _bucketed(spark: SparkSession, sf_dir: str):
    from core_telecoms_etl_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.col("event_id").alias("eid"),
        F.unix_micros("ts").alias("tus"),
    )
    span = base.agg(F.min("eid").alias("lo"), F.max("eid").alias("hi"))
    return base.join(F.broadcast(span)).withColumn(
        "bkt",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(N_BUCKETS - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("eid") - F.col("lo"))
                        * F.lit(N_BUCKETS)
                        / (F.col("hi") - F.col("lo"))
                    ).cast("long"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )


def _w_in():
    return (
        Window.partitionBy("bkt")
        .orderBy("eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _w_off():
    return (
        Window.partitionBy(F.pmod(F.col("bkt"), F.lit(1)))
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )


def _finish(cum: DataFrame, offsets: DataFrame) -> DataFrame:
    joined = cum.join(F.broadcast(offsets), "bkt").withColumn(
        "high_water",
        F.greatest(
            F.col("hw_in"), F.coalesce(F.col("prev_max"), F.col("hw_in"))
        ),
    )
    late = (F.col("tus") < F.col("high_water") - F.lit(DELAY_US)).cast("int")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(late).cast("long").alias("n_late_1h"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late_1h",
            F.round(
                F.col("n_late_1h") / F.col("n_events").cast("double"), 6
            ).alias("p_late"),
        )
        .orderBy("event_type")
    )


def form_current(spark, sf_dir):
    bucketed = _bucketed(spark, sf_dir)
    cum = bucketed.select(
        "event_type", "bkt", "tus", F.max("tus").over(_w_in()).alias("hw_in")
    )
    totals = bucketed.groupBy("bkt").agg(F.max("tus").alias("bmax"))
    offsets = totals.select(
        "bkt", F.max("bmax").over(_w_off()).alias("prev_max")
    )
    return _finish(cum, offsets)


def form_reuse(spark, sf_dir):
    bucketed = _bucketed(spark, sf_dir)
    cum = bucketed.select(
        "event_type", "bkt", "tus", F.max("tus").over(_w_in()).alias("hw_in")
    )
    # (bkt, event_type)-grain aggregate ON THE WINDOW OUTPUT: referencing
    # hw_in keeps the Window (and its exchange) in this branch's subtree,
    # and grouping by event_type keeps the pruned child columns identical
    # to the probe branch -> canonicalized exchange reuse fires.
    agg2 = cum.groupBy("bkt", "event_type").agg(
        F.count("*").alias("__n"), F.max("hw_in").alias("__m")
    )
    totals = agg2.groupBy("bkt").agg(F.max("__m").alias("bmax"))
    offsets = totals.select(
        "bkt", F.max("bmax").over(_w_off()).alias("prev_max")
    )
    per_type = agg2.groupBy("event_type").agg(
        F.sum("__n").cast("long").alias("n_events")
    )
    joined = cum.join(F.broadcast(offsets), "bkt").withColumn(
        "high_water",
        F.greatest(
            F.col("hw_in"), F.coalesce(F.col("prev_max"), F.col("hw_in"))
        ),
    )
    late_counts = (
        joined.filter(F.col("tus") < F.col("high_water") - F.lit(DELAY_US))
        .groupBy("event_type")
        .agg(F.count("*").alias("__n_late"))
    )
    return (
        per_type.join(late_counts, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.coalesce(F.col("__n_late"), F.lit(0))
            .cast("long")
            .alias("n_late_1h"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late_1h",
            F.round(
                F.col("n_late_1h") / F.col("n_events").cast("double"), 6
            ).alias("p_late"),
        )
        .orderBy("event_type")
    )


def form_pin(spark, sf_dir):
    from core_telecoms_etl_spark.caching import cache_scoped

    bucketed = cache_scoped(
        "probe.late_arrival.bucketed", _bucketed(spark, sf_dir)
    )
    cum = bucketed.select(
        "event_type", "bkt", "tus", F.max("tus").over(_w_in()).alias("hw_in")
    )
    totals = bucketed.groupBy("bkt").agg(F.max("tus").alias("bmax"))
    offsets = totals.select(
        "bkt", F.max("bmax").over(_w_off()).alias("prev_max")
    )
    return _finish(cum, offsets)


FORMS = {"current": form_current, "reuse": form_reuse, "pin": form_pin}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from core_telecoms_etl_spark import get_spark

    spark = get_spark("late-arrival-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = {k: fn(spark, sf_dir).collect() for k, fn in FORMS.items()}
    assert rows["current"] == rows["reuse"], "reuse form diverges"
    assert rows["current"] == rows["pin"], "pin form diverges"
    print(f"results identical across forms ({len(rows['current'])} rows)")

    times: dict[str, list[float]] = {k: [] for k in FORMS}
    for _ in range(reps):
        for k, fn in FORMS.items():
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"late_arrival:{k}")
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        ts = sorted(ts)
        print(
            f"{k:8s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} all="
            + ",".join(f"{t:.3f}" for t in ts)
        )


if __name__ == "__main__":
    main()
