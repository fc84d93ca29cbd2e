

def test_approx_quantiles_close_to_exact(spark, sf_dir):
    """t-digest quantiles stay within 1% relative error of the exact
    interpolated percentiles at accuracy=10000."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias(
                "approx"
            ),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r.approx - r.exact) / r.exact < 0.01, r


def test_hll_rollup_merge_matches_exact_within_tolerance(spark, sf_dir):
    """Day-sketch → month-merge HLL estimates stay within 2% of the exact
    per-month distinct-customer counts (well inside the ~1.6% standard
    error of the default lgConfigK=12 sketch) — tighter than the 5% flag
    the hll_rollup query projects for its oracle row. The merge pipeline
    here mirrors the query's internals on the raw estimate."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        orders.withColumn("month", F.date_trunc("month", "o_orderdate"))
        .withColumn("day", F.date_trunc("day", "o_orderdate"))
        .groupBy("month", "day")
        .agg(F.expr("hll_sketch_agg(o_custkey)").alias("sk"))
    )
    approx = {
        r.month: r.a
        for r in daily.groupBy("month")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("a"))
        .collect()
    }
    exact = {
        r.month: r.e
        for r in orders.withColumn("month", F.date_trunc("month", "o_orderdate"))
        .groupBy("month")
        .agg(F.countDistinct("o_custkey").alias("e"))
        .collect()
    }
    assert set(approx) == set(exact)
    for m, e in exact.items():
        assert abs(approx[m] - e) / e < 0.02, (m, approx[m], e)


def test_hll_rollup_query_flags_all_within_tolerance(spark, sf_dir):
    """Every month row of the declared query must carry a raised
    est_within_5pct flag — the deterministic projection its oracle
    asserts."""
    from core_telecoms_etl_spark.queries.relational import hll_rollup

    rows = hll_rollup(spark, sf_dir).collect()
    assert rows and all(r.est_within_5pct == 1 for r in rows)


def test_theta_setops_flags_raised(spark, sf_dir):
    """Theta-sketch union/intersection/difference estimates must clear
    their declared tolerance flags (exact below nominal entries at test
    scale), with consistent exact set arithmetic."""
    from core_telecoms_etl_spark.queries.relational import (
        theta_sketch_setops,
    )

    r = theta_sketch_setops(spark, sf_dir).first()
    assert (
        r.a_ok == r.b_ok == r.union_ok == r.intersect_ok == r.diff_ok == 1
    )
    assert r.n_union_exact == (
        r.n_a_exact + r.n_b_exact - r.n_intersect_exact
    )
    assert r.n_diff_exact == r.n_a_exact - r.n_intersect_exact


def test_kll_rollup_flags_raised(spark, sf_dir):
    """Month-sketch → status-merge KLL quantiles must land inside the
    declared exact rank bands at the test scale."""
    from core_telecoms_etl_spark.queries.relational import (
        kll_quantile_rollup,
    )

    rows = kll_quantile_rollup(spark, sf_dir).collect()
    assert rows and all(
        r.p50_in_band == 1 and r.p90_in_band == 1 for r in rows
    )


def test_heavy_hitters_sketch_is_exact_under_tracked_bound(spark, sf_dir):
    """With maxItemsTracked above the distinct-key count, approx_top_k
    counts equal the exact GROUP BY counts for every returned item."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.relational import heavy_hitters

    got = heavy_hitters(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_partkey: r.n
        for r in li.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()
    }
    assert len(got) == 10
    for r in got:
        assert exact[r.item] == r.n, r


def test_recursive_hierarchy_walk_depths(spark, tmp_path):
    """Keys 1..999 walk to single-digit roots: depth = digits - 1,
    counts match the decimal structure exactly."""
    from core_telecoms_etl_spark.queries.relational import (
        recursive_hierarchy_walk,
    )

    part = spark.createDataFrame(
        [(i,) for i in range(1, 1000)], ["p_partkey"]
    )
    d = tmp_path / "star"
    part.write.parquet(str(d / "part.parquet"))
    out = {r.depth: r for r in recursive_hierarchy_walk(spark, str(d)).collect()}
    assert out[0].n_parts == 9  # 1..9 are their own roots
    assert out[1].n_parts == 90  # 10..99
    assert out[2].n_parts == 900  # 100..999
    assert out[2].n_roots == 9


def test_hll_sliding_distinct_window_semantics(spark, tmp_path):
    """Hand events across 3 days with overlapping users: the trailing
    window unions correctly and the sparse-mode estimate is exact."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.relational import (
        hll_sliding_distinct,
    )

    rows = []
    eid = 0
    # day 1: users {1,2}; day 2: {2,3}; day 10: {9}
    for day, users in [(1, [1, 2]), (2, [2, 3]), (10, [9])]:
        for u in users:
            rows.append((eid, u, f"2020-01-{day:02d} 08:00:00")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    out = {str(r.day): r for r in hll_sliding_distinct(spark, str(d)).collect()}
    assert out["2020-01-01"].exact_users_7d == 2
    assert out["2020-01-02"].exact_users_7d == 3  # {1,2,3}
    assert out["2020-01-10"].exact_users_7d == 1  # window left days 1-2
    assert all(r.est_within_5pct == 1 for r in out.values())
    assert out["2020-01-02"].n_events_7d == 4
