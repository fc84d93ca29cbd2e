

def test_cap_per_group_caps_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(g, i, 100 - i) for g in ("a", "b") for i in range(20)],
        "grp string, id long, score long",
    )
    out = cap_per_group(
        df, "grp", [F.desc("score"), F.col("id")], 5, rank_col="rk"
    )
    rows = out.collect()
    assert len(rows) == 10
    # highest-score rows kept, rank is 1..5 per group
    for g in ("a", "b"):
        got = sorted(
            (r.id, r.rk) for r in rows if r.grp == g
        )
        assert got == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]


def test_weighted_sample_k_proportional_and_planned(spark):
    """A-ES sanity: across independent salts, rows with 9× weight are
    drawn far more often than unit-weight rows; the plan is a
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    from core_telecoms_etl_spark.operators.sampling import weighted_sample_k

    rows = [(i, 9.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy_hits = 0
    draws = 0
    for salt in ("s1", "s2", "s3", "s4"):
        got = {
            r.id for r in weighted_sample_k(df, "id", "w", 40, salt=salt).collect()
        }
        assert len(got) == 40
        heavy_hits += sum(1 for i in got if i < 20)
        draws += 1
    # 20 heavy rows carry 180/360 = half the total weight; uniform
    # sampling would pick ~4 of them per 40-row draw. Expect far more.
    assert heavy_hits / draws >= 10, heavy_hits
    plan = (
        weighted_sample_k(df, "id", "w", 40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_k_deterministic_per_salt(spark):
    from core_telecoms_etl_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(100)], "id long, w double"
    )
    a = [r.id for r in weighted_sample_k(df, "id", "w", 10).collect()]
    b = [r.id for r in weighted_sample_k(df, "id", "w", 10).collect()]
    c = [r.id for r in weighted_sample_k(df, "id", "w", 10, salt="other").collect()]
    assert a == b
    assert a != c  # different salt = independent redraw
