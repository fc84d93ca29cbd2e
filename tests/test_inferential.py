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
