"""Data-quality check tests (SURVEY.md §2.12): the dbt not_null/unique
schema-test semantics on crafted violations."""

from __future__ import annotations

from core_telecoms_etl_spark.operators import dq


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (None, "d")], "k int, v string"
    )


def test_not_null_counts(spark):
    res = dq.check_not_null(_df(spark), ["k", "v"])
    got = {r.column: r.violations for r in res}
    assert got == {"k": 1, "v": 1}
    assert not res[0].passed


def test_unique_counts_excess_rows(spark):
    res = dq.check_unique(_df(spark), ["k"])
    assert res[0].violations == 1  # one excess duplicate of k=1
    clean = dq.check_unique(_df(spark), ["v"])
    assert clean[0].violations == 0  # NULLs don't count as duplicates


def test_accepted_values(spark):
    res = dq.check_accepted_values(_df(spark), "v", ["a", "b"])
    assert res[0].violations == 1  # 'd'; NULL is not a violation


def test_run_checks_combined(spark):
    res = dq.run_checks(_df(spark), not_null=["k"], unique=["k"])
    assert [r.check for r in res] == ["not_null", "unique"]


def test_run_checks_single_action_all_check_types(spark):
    """The fused suite: not_null + accepted_values share one aggregate,
    unique keys union into the same plan — results match the per-check
    helpers exactly."""
    df = _df(spark)
    res = dq.run_checks(
        df,
        not_null=["k", "v"],
        unique=["k", "v"],
        accepted_values={"v": ["a", "b"]},
    )
    got = {(r.check, r.column): r.violations for r in res}
    assert got == {
        ("not_null", "k"): 1,
        ("not_null", "v"): 1,
        ("accepted_values", "v"): 1,
        ("unique", "k"): 1,
        ("unique", "v"): 0,
    }


def test_checks_df_is_one_plan(spark):
    """checks_df returns a single relation (one action materializes the
    whole suite)."""
    out = dq.checks_df(
        _df(spark), not_null=["k"], unique=["k"], accepted_values={"v": ["a"]}
    )
    assert out.columns == ["check_name", "column_name", "violations"]
    assert out.count() == 3


def test_star_schema_dq_green(spark, sf_dir):
    """The reference's post-build `dbt test` analog: every declared check
    on the built star schema passes on the driver data."""
    from core_telecoms_etl_spark.plans.star import run_star_dq

    results = run_star_dq(spark, sf_dir)
    assert set(results) == {"dim_customers", "dim_agents", "fact_complaints"}
    for model, checks in results.items():
        for c in checks:
            assert c.passed, f"{model}.{c.column} {c.check}: {c.violations}"


def test_profile_columns_one_pass_stats(spark):
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.operators.dq import profile_columns

    d = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (4, 4.0, "a")],
        "id long, x double, s string",
    )
    rows = {
        r.column: r
        for r in profile_columns(
            d, numeric_cols=("id", "x"), string_cols=("s",)
        ).collect()
    }
    assert rows["id"].n_rows == 4 and rows["id"].n_nulls == 0
    assert rows["id"].n_distinct == 4
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 4.0
    assert rows["x"].n_nulls == 1 and rows["x"].n_distinct == 2
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None and rows["id"].min_str is None
