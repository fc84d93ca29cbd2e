"""Behavior tests for queries/inferential.py against hand-computable
micro-oracles (the DuckDB parity gate lives in tools/check_oracle.py;
these pin the STATISTICS themselves)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_chi_square_independent_uniform_is_zero(spark, tmp_path):
    """A perfectly balanced contingency table has chi2 == 0 and the
    same shape the query emits (1 row, exact integer n/dof)."""
    from core_telecoms_etl_spark.queries.inferential import (
        chi_square_independence,
    )

    # build a tiny star: every (segment, priority) cell has exactly 2
    # orders -> observed == expected everywhere
    segs = ["A", "B", "C"]
    pris = ["1", "2"]
    cust = spark.createDataFrame(
        [(i, s) for i, s in enumerate(segs)], ["c_custkey", "c_mktsegment"]
    )
    orders = spark.createDataFrame(
        [
            (100 * i + 10 * j + k, i, p)
            for i, _ in enumerate(segs)
            for j, p in enumerate(pris)
            for k in range(2)
        ],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = tmp_path / "star"
    cust.write.parquet(str(d / "customer.parquet"))
    orders.write.parquet(str(d / "orders.parquet"))
    row = chi_square_independence(spark, str(d)).collect()[0]
    assert row.n_rows == 12
    assert row.dof == (3 - 1) * (2 - 1)
    assert row.chi2 == 0.0
    assert row.cramers_v == 0.0


def test_chi_square_hand_value(spark, tmp_path):
    """2x2 table [[10, 0], [0, 10]]: chi2 = N = 20, Cramér's V = 1."""
    from core_telecoms_etl_spark.queries.inferential import (
        chi_square_independence,
    )

    cust = spark.createDataFrame(
        [(1, "A"), (2, "B")], ["c_custkey", "c_mktsegment"]
    )
    orders = spark.createDataFrame(
        [(i, 1, "1") for i in range(10)]
        + [(100 + i, 2, "2") for i in range(10)],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = tmp_path / "star"
    cust.write.parquet(str(d / "customer.parquet"))
    orders.write.parquet(str(d / "orders.parquet"))
    row = chi_square_independence(spark, str(d)).collect()[0]
    assert row.chi2 == 20.0
    assert row.cramers_v == 1.0
    assert row.dof == 1


def test_entropy_uniform_and_point_mass(spark, tmp_path):
    """Uniform mix -> H = ln(k), norm_entropy = 1; the real-table run
    returns one row per segment with H in [0, ln(n_cats)]."""
    from core_telecoms_etl_spark.queries.inferential import entropy_by_group

    cust = spark.createDataFrame(
        [(1, "U"), (2, "P")], ["c_custkey", "c_mktsegment"]
    )
    orders = spark.createDataFrame(
        # segment U: 3 priorities x 4 orders (uniform); P: all one kind
        [(10 * j + k, 1, str(j)) for j in range(3) for k in range(4)]
        + [(900 + k, 2, "0") for k in range(5)],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = tmp_path / "star"
    cust.write.parquet(str(d / "customer.parquet"))
    orders.write.parquet(str(d / "orders.parquet"))
    out = {
        r.segment: r for r in entropy_by_group(spark, str(d)).collect()
    }
    assert abs(out["U"].entropy - math.log(3)) < 1e-5
    assert abs(out["U"].norm_entropy - 1.0) < 1e-5
    assert out["P"].entropy == 0.0
    assert out["P"].n_cats == 1
    assert out["P"].norm_entropy is None  # ln(1) guard, not NaN/error


def test_cusum_finds_the_step(spark, tmp_path):
    """A flat series with one level shift peaks |CUSUM| at the last
    pre-shift day (deviations accumulate until the mean crosses)."""
    from core_telecoms_etl_spark.queries.inferential import cusum_changepoint

    rows = []
    k = 0
    for day in range(1, 21):
        # 10 days at 100.00, then 10 days at 300.00 (one item/day)
        price = 100.0 if day <= 10 else 300.0
        rows.append((k, f"2020-01-{day:02d} 00:00:00", price, 0.0))
        k += 1
    li = spark.createDataFrame(
        rows, ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    d = tmp_path / "star"
    li.write.parquet(str(d / "lineitem.parquet"))
    row = cusum_changepoint(spark, str(d)).collect()[0]
    assert str(row.change_date) == "2020-01-10"
    assert row.n_days == 20
    # S_10 = C_10 - 10*T/20 = 1000 - 2000 = -1000 money units
    assert row.cusum_money == -1000.0


def test_grouped_trend_recovers_exact_line(spark, tmp_path):
    """y = 7.5 + 2.25*x fit on exact points returns slope/intercept
    to the cent (closed-form over integer grids)."""
    from core_telecoms_etl_spark.queries.inferential import grouped_trend

    sup = spark.createDataFrame([(1, 10)], ["s_suppkey", "s_nationkey"])
    nat = spark.createDataFrame([(10, "X")], ["n_nationkey", "n_name"])
    rows = []
    for m in range(6):  # months Jan..Jun 1995 -> mi = 0..5
        y = 7.5 + 2.25 * m
        rows.append((m, 1, f"1995-{m + 1:02d}-15 00:00:00", y, 0.0))
    li = spark.createDataFrame(
        rows,
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    d = tmp_path / "star"
    sup.write.parquet(str(d / "supplier.parquet"))
    nat.write.parquet(str(d / "nation.parquet"))
    li.write.parquet(str(d / "lineitem.parquet"))
    row = grouped_trend(spark, str(d)).collect()[0]
    assert row.n_name == "X"
    assert row.n_months == 6
    assert abs(row.slope_money_per_month - 2.25) < 1e-9
    assert abs(row.intercept_money - 7.5) < 1e-9


def test_grouped_trend_skips_degenerate_groups(spark):
    """Single-month groups (zero x-variance) are excluded by the
    all-integer guard instead of emitting engine-specific inf/NaN."""
    from core_telecoms_etl_spark.queries.inferential import grouped_trend

    out = grouped_trend(spark, SF)
    rows = out.collect()
    assert all(r.n_months > 1 for r in rows)
    assert all(
        r.slope_money_per_month is not None
        and not math.isnan(r.slope_money_per_month)
        for r in rows
    )


def test_mann_whitney_hand_value(spark, tmp_path):
    """Classic no-tie example: A = {1,2,3}, B = {4,5,6} -> U_a = 0,
    2R_a = 2*(1+2+3) = 12, ties = 0."""
    from core_telecoms_etl_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(float(v), "a") for v in (1, 2, 3)]
        + [(float(v), "b") for v in (4, 5, 6)],
        ["value", "grp"],
    )
    row = mann_whitney_u(
        df, value_col="value", group_col="grp", group_a="a", group_b="b"
    ).collect()[0]
    assert (row.n_a, row.n_b) == (3, 3)
    assert row.u2_scaled == 0  # 2*U_a
    assert row.u_a == 0.0
    # z = (0 - 4.5)/sqrt(3*3*7/12) = -4.5/2.2913 = -1.9640
    assert abs(row.z - (-1.9640)) < 1e-3
    assert row.reject_h0 == 1


def test_mann_whitney_identical_groups_z_zero(spark):
    """The same values in both groups give U_a = n^2/2, z = 0."""
    from core_telecoms_etl_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(float(v), g) for v in (1, 2, 3, 4) for g in ("a", "b")],
        ["value", "grp"],
    )
    row = mann_whitney_u(
        df, value_col="value", group_col="grp", group_a="a", group_b="b"
    ).collect()[0]
    assert row.u_a == 8.0  # 4*4/2
    assert row.z == 0.0
    assert row.reject_h0 == 0


def test_mann_whitney_degenerate_all_tied_is_null(spark):
    """A single distinct value has sigma = 0: z must be NULL via the
    all-integer guard, not an ANSI divide error."""
    from core_telecoms_etl_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(5.0, "a")] * 3 + [(5.0, "b")] * 3, ["value", "grp"]
    )
    row = mann_whitney_u(
        df, value_col="value", group_col="grp", group_a="a", group_b="b"
    ).collect()[0]
    assert row.z is None


def test_gini_known_distributions(spark, tmp_path):
    """Equal revenues -> G = 0; one customer holding everything ->
    G = (n-1)/n."""
    from core_telecoms_etl_spark.queries.inferential import gini_concentration

    cust = spark.createDataFrame(
        [(i, "EQ") for i in range(4)] + [(10 + i, "ONE") for i in range(4)],
        ["c_custkey", "c_mktsegment"],
    )
    orders = spark.createDataFrame(
        [(i, i, 50.0) for i in range(4)]  # EQ: everyone 50
        + [(100, 10, 200.0)]  # ONE: cust 10 has it all...
        + [(101 + i, 11 + i, 0.0) for i in range(3)],  # ...rest zero
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    d = tmp_path / "star"
    cust.write.parquet(str(d / "customer.parquet"))
    orders.write.parquet(str(d / "orders.parquet"))
    out = {r.segment: r for r in gini_concentration(spark, str(d)).collect()}
    assert out["EQ"].gini == 0.0
    assert abs(out["ONE"].gini - 0.75) < 1e-9  # (n-1)/n, n=4
    assert out["EQ"].total_revenue == 200.0


def test_gini_bucketed_rank_matches_plain_window(spark):
    """The two-level bucketed rank-weighted sum must equal the naive
    per-segment global window on the real table."""
    from pyspark.sql import Window as W

    from core_telecoms_etl_spark.queries.inferential import gini_concentration

    out = {r.segment: r.gini for r in gini_concentration(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    s = pc.join(cust, pc.o_custkey == cust.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    g = (
        s.withColumn("i", F.row_number().over(w).cast("long"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("i") * F.col("x")).alias("a"),
        )
        .select(
            "c_mktsegment",
            F.round(
                (
                    F.lit(2) * F.col("a")
                    - (F.col("n") + F.lit(1)) * F.col("sx")
                ).cast("double")
                / (F.col("n").cast("double") * F.col("sx")),
                6,
            ).alias("gini"),
        )
    )
    naive = {r.c_mktsegment: r.gini for r in g.collect()}
    assert out == naive


def test_seasonal_naive_perfect_seasonality_zero_wape(spark, tmp_path):
    """A series that repeats exactly year-over-year backtests to
    WAPE = 0 and bias = 0."""
    from core_telecoms_etl_spark.queries.inferential import (
        seasonal_naive_forecast,
    )

    rows = []
    k = 0
    for year in (1995, 1996):
        for mo in range(1, 13):
            rows.append((k, "N", f"{year}-{mo:02d}-10 00:00:00", 100.0 + mo, 0.0))
            k += 1
    li = spark.createDataFrame(
        rows,
        ["l_orderkey", "l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"],
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    d = tmp_path / "star"
    li.write.parquet(str(d / "lineitem.parquet"))
    row = seasonal_naive_forecast(spark, str(d)).collect()[0]
    assert row.n_months_tested == 12
    assert row.wape == 0.0
    assert row.bias == 0.0


def test_kaplan_meier_hand_curve(spark, tmp_path):
    """3 users: durations 1 (error=churn), 2 (error), 3 (censored):
    S(1) = 2/3, S(2) = 1/3; the censored user never drops the curve."""
    from core_telecoms_etl_spark.queries.inferential import kaplan_meier

    rows = []
    # user 1: day0 signup, day1 error (observed churn at t=1)
    rows += [(1, 1, "2020-01-01 00:00:00", "signup"),
             (2, 1, "2020-01-02 00:00:00", "error")]
    # user 2: day0 signup, day2 error (observed at t=2)
    rows += [(3, 2, "2020-01-01 00:00:00", "signup"),
             (4, 2, "2020-01-03 00:00:00", "error")]
    # user 3: day0 signup, day3 purchase (censored at t=3)
    rows += [(5, 3, "2020-01-01 00:00:00", "signup"),
             (6, 3, "2020-01-04 00:00:00", "purchase")]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    out = kaplan_meier(spark, str(d)).collect()
    assert [(r.duration_days, r.n_risk, r.n_events) for r in out] == [
        (1, 3, 1),
        (2, 2, 1),
    ]
    assert abs(out[0].survival - 2 / 3) < 1e-6
    assert abs(out[1].survival - 1 / 3) < 1e-6


def test_kaplan_meier_hits_zero_exactly(spark, tmp_path):
    """When every user churns, the curve ends at exactly 0.0 (integer
    flag), not exp(ln(0))."""
    from core_telecoms_etl_spark.queries.inferential import kaplan_meier

    rows = []
    for u in (1, 2):
        rows += [(10 * u, u, "2020-01-01 00:00:00", "signup"),
                 (10 * u + 1, u, f"2020-01-0{u + 1} 00:00:00", "error")]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    out = kaplan_meier(spark, str(d)).collect()
    assert out[-1].survival == 0.0


def test_bootstrap_ci_brackets_the_mean_and_is_stable(spark):
    """The 95% CI brackets the point estimate, is positive-width, and
    is bit-identical across two runs (md5 draws, no RNG)."""
    from core_telecoms_etl_spark.queries.inferential import bootstrap_ci

    r1 = bootstrap_ci(spark, SF).collect()[0]
    r2 = bootstrap_ci(spark, SF).collect()[0]
    assert r1 == r2
    assert r1.b_reps == 200
    assert r1.ci_lo < r1.mean_revenue < r1.ci_hi
    assert r1.ci_lo > 0


def test_bootstrap_poisson_weights_mean_one(spark):
    """Across customers x replicates the Poisson(1) weights must
    average ~1 (the resample preserves expected mass)."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries import inferential as inf

    pc = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("x"))
    )
    drawn = pc.select(
        "k", F.explode(F.sequence(F.lit(1), F.lit(50))).alias("rep")
    ).select(
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bs:"),
                                F.col("rep").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                + F.lit(1.0)
            )
            / F.lit(4294967296.0)
        ).alias("u")
    )
    wt = None
    for t in inf._POIS1_CDF:
        term = F.when(F.col("u") > F.lit(t), 1).otherwise(0)
        wt = term if wt is None else wt + term
    m = drawn.select(wt.alias("w")).agg(F.avg("w")).collect()[0][0]
    assert abs(m - 1.0) < 0.05


def test_ewma_control_chart_hand_fold(spark, tmp_path):
    """Constant series -> ewma == value, no breaches; a spike breaches
    and the fold follows the recursion exactly."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.inferential import (
        ewma_control_chart,
    )

    rows = []
    for day in range(1, 8):
        val = 100.0 if day != 6 else 200.0  # spike on day 6
        rows.append((day, f"2020-01-{day:02d} 00:00:00", val, 0.0))
    li = spark.createDataFrame(
        rows, ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    d = tmp_path / "star"
    li.write.parquet(str(d / "lineitem.parquet"))
    out = ewma_control_chart(spark, str(d)).collect()
    assert [r.band_breach for r in out[:5]] == [0, 0, 0, 0, 0]
    assert out[0].ewma30 == 100.0
    # day 6: window = [100]*5 + [200] -> ewma = 100*0.8 + 0.2*200 = 120
    assert out[5].ewma30 == 120.0
    assert out[5].band_breach == 1  # 200 > 1.15 * 120
    # day 7: 120*0.8 + 0.2*100 = 116... but window restarts fold from
    # its FIRST element (trailing-30 window, all 7 rows): verify by
    # replaying the recursion
    acc = 100.0
    for v in [100.0, 100.0, 100.0, 100.0, 200.0, 100.0]:
        acc = acc * 0.8 + 0.2 * v
    assert abs(out[6].ewma30 - round(acc, 2)) < 1e-9


def test_log_rank_identical_groups_chi2_zero(spark, tmp_path):
    """If both cohorts churn identically, O == E and chi2 == 0."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.inferential import log_rank_test

    rows = []
    eid = 0
    # users 1-4: two purchasers (1, 2), two not (3, 4), with group-
    # BALANCED lifetimes — one of each group dies at day 2, the other
    # at day 4 -> at every death time the A-share of events equals the
    # A-share at risk -> O == E, chi2 == 0 (and V > 0 because deaths
    # spread over two times with survivors at risk at the first)
    for u in (1, 2, 3, 4):
        rows.append((eid, u, "2020-01-01 00:00:00", "signup")); eid += 1
        if u <= 2:
            rows.append((eid, u, "2020-01-02 00:00:00", "purchase")); eid += 1
        end = "2020-01-03" if u in (1, 3) else "2020-01-05"
        rows.append((eid, u, f"{end} 00:00:00", "error")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    r = log_rank_test(spark, str(d)).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.observed_a == 2
    assert abs(r.expected_a - 2.0) < 1e-9
    assert r.chi2 == 0.0


def test_lift_analysis_perfect_pair(spark, tmp_path):
    """A pair always bought together in 3 of 6 baskets has
    lift = N/max(da,db) when exclusive -> here 6/3 = 2.0."""
    from core_telecoms_etl_spark.queries.analytics import lift_analysis

    rows = []
    # baskets 1-3: {10, 11}; baskets 4-6: {20}
    for o in (1, 2, 3):
        rows += [(o, 10), (o, 11)]
    for o in (4, 5, 6):
        rows += [(o, 20)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    d = tmp_path / "star"
    li.write.parquet(str(d / "lineitem.parquet"))
    out = lift_analysis(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.n_both) == (10, 11, 3)
    assert r.support == 0.5
    assert r.confidence_a_b == 1.0
    assert r.lift == 2.0  # 3*6/(3*3)


def test_cohort_ltv_is_cumulative_and_normalized(spark):
    """Within each cohort the LTV curve is nondecreasing in age."""
    from core_telecoms_etl_spark.queries.inferential import (  # noqa: F401
        log_rank_test,
    )
    import __spark_entry__ as e

    rows = e.queries()["cohort_ltv_curve"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by = {}
    for r in rows:
        by.setdefault(r.cohort, []).append((r.age_week, r.ltv_per_user))
    for curve in by.values():
        curve.sort()
        vals = [v for _, v in curve]
        assert vals == sorted(vals)  # cumulative -> nondecreasing


def test_moments_profile_known_distribution(spark, tmp_path):
    """A symmetric two-point distribution has skewness 0 and excess
    kurtosis -2; a constant column guards to NULL."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.inferential import moments_profile

    rows = (
        [(i, "sym", 10.0) for i in range(50)]
        + [(100 + i, "sym", 20.0) for i in range(50)]
        + [(200 + i, "const", 7.0) for i in range(10)]
    )
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    out = {r.event_type: r for r in moments_profile(spark, str(d)).collect()}
    s = out["sym"]
    assert s.mean_value == 15.0
    assert s.std_value == 5.0  # population std of the two-point mass
    assert s.skewness == 0.0
    assert s.excess_kurtosis == -2.0  # Bernoulli(1/2): kurtosis 1
    c = out["const"]
    assert c.std_value == 0.0
    assert c.skewness is None and c.excess_kurtosis is None


def test_moments_profile_large_constant_cancellation(spark, tmp_path):
    """ADVICE r12: for a constant group with LARGE values,
    fl(n·s2) − fl(s1²) is cancellation noise (either sign, magnitude
    ~5e-16·n·s2) — the old k2 > 0 guard coin-flipped between NaN-vs-
    oracle-crash (negative draw) and astronomically wrong shape stats
    (positive draw). The magnitude-relative guard must map BOTH draws
    to the integer-form answer: std 0.0, skew/kurtosis NULL. Also pins
    the exact string anchors that carry the 128-bit sums through the
    oracle gate."""
    from core_telecoms_etl_spark.queries.inferential import moments_profile

    n, val = 20_000, 123456.78
    x = round(val * 100)  # exact cents
    ev = spark.createDataFrame(
        [(i, "bigconst", val) for i in range(n)],
        ["event_id", "event_type", "value"],
    )
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    r = moments_profile(spark, str(d)).collect()[0]
    assert r.n_events == n
    assert r.mean_value == round(val, 4)
    assert r.std_value == 0.0
    assert r.skewness is None and r.excess_kurtosis is None
    # exact 128-bit anchors: digit-for-digit the closed-form sums
    assert r.s1_anchor == str(n * x)
    assert r.s2_anchor == str(n * x**2)
    assert r.s3_anchor == str(n * x**3)
    assert r.s4_anchor == str(n * x**4)


def test_mutual_information_independent_and_dependent(spark, tmp_path):
    """A balanced independent table has MI == 0; a perfectly dependent
    2x2 diagonal table has MI == H == ln 2 and NMI == 1."""
    import math

    from core_telecoms_etl_spark.queries.inferential import (
        mutual_information,
    )

    # independent: every (segment, priority) cell has exactly 3 orders
    cust = spark.createDataFrame(
        [(1, "A"), (2, "B")], ["c_custkey", "c_mktsegment"]
    )
    orders = spark.createDataFrame(
        [
            (100 * i + 10 * j + k, i, p)
            for i in (1, 2)
            for j, p in enumerate(["1", "2"])
            for k in range(3)
        ],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = tmp_path / "indep"
    cust.write.parquet(str(d / "customer.parquet"))
    orders.write.parquet(str(d / "orders.parquet"))
    r = mutual_information(spark, str(d)).collect()[0]
    assert r.n_rows == 12
    assert r.mutual_info == 0.0
    assert r.nmi == 0.0

    # dependent: diagonal [[5, 0], [0, 5]] -> I = H_row = H_col = ln 2
    orders2 = spark.createDataFrame(
        [(i, 1, "1") for i in range(5)] + [(50 + i, 2, "2") for i in range(5)],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d2 = tmp_path / "dep"
    cust.write.parquet(str(d2 / "customer.parquet"))
    orders2.write.parquet(str(d2 / "orders.parquet"))
    r2 = mutual_information(spark, str(d2)).collect()[0]
    ln2 = round(math.log(2.0), 6)
    assert r2.mutual_info == ln2
    assert r2.h_segment == ln2 and r2.h_priority == ln2
    assert r2.nmi == 1.0


def test_runs_test_alternating_and_blocked(spark, tmp_path):
    """A perfectly alternating hi/lo series maximizes runs (z > 0,
    exact hand value); a two-block series has exactly 2 runs (z < 0)."""
    from datetime import date

    from core_telecoms_etl_spark.queries.inferential import runs_test

    def mk(vals):
        return spark.createDataFrame(
            [
                (i, date(2024, 1, 1 + i), float(v), 0.0)
                for i, v in enumerate(vals)
            ],
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )

    d1 = tmp_path / "alt"
    mk([10.0, 20.0, 10.0, 20.0]).write.parquet(str(d1 / "lineitem.parquet"))
    r = runs_test(spark, str(d1)).collect()[0]
    assert (r.n_days, r.n_above, r.n_below, r.runs) == (4, 2, 2, 4)
    assert r.expected_runs == 3.0
    assert r.z_score == 1.224745  # (4-3)/sqrt(2/3)

    d2 = tmp_path / "blk"
    mk([10.0, 10.0, 20.0, 20.0]).write.parquet(str(d2 / "lineitem.parquet"))
    r2 = runs_test(spark, str(d2)).collect()[0]
    assert r2.runs == 2
    assert r2.z_score == -1.224745

    # degenerate: constant series -> every day ties the mean, z NULL
    d3 = tmp_path / "const"
    mk([10.0, 10.0]).write.parquet(str(d3 / "lineitem.parquet"))
    r3 = runs_test(spark, str(d3)).collect()[0]
    assert r3.n_days == 0 and r3.z_score is None


def test_bootstrap_partials_bit_equal_to_row_expansion(spark, sf_dir):
    """The array-partial bootstrap must reproduce bootstrap_ci's single
    output row BIT-FOR-BIT: same md5 draws, same literal Poisson CDF,
    same replicate reduce — only the physical shape differs (per-batch
    elementwise partials instead of the B× row expansion)."""
    from core_telecoms_etl_spark.queries.inferential import (
        bootstrap_ci,
        bootstrap_ci_partials,
    )

    a = bootstrap_ci(spark, sf_dir).collect()
    b = bootstrap_ci_partials(spark, sf_dir).collect()
    assert len(a) == len(b) == 1
    assert a[0].asDict() == b[0].asDict()


def test_kll_sliding_quantile_merges_across_days(spark, tmp_path):
    """The windowed KLL merge must see PREVIOUS days' sketches: day 2's
    own values are all 100 but days 0-1 contribute sixty 1.0s, so the
    window median sits near 1.0 — inside the exact band (flag 1), which
    an unmerged per-day sketch (p50=100) would miss."""
    import datetime

    from core_telecoms_etl_spark.queries.relational import (
        kll_sliding_quantile,
    )

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for day, vals in enumerate(
        ([1.0] * 30, [1.0] * 30, [100.0] * 10)
    ):
        for v in vals:
            rows.append(
                (eid, eid % 7, base + datetime.timedelta(days=day, hours=1),
                 "click", v)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    d = tmp_path / "ev"
    df.write.parquet(str(d / "events.parquet"))
    out = {r.day.isoformat(): r for r in kll_sliding_quantile(spark, str(d)).collect()}
    assert out["2024-01-03"].n_events_7d == 70
    assert all(r.p50_in_band == 1 for r in out.values())
