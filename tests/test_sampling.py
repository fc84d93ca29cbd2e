

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
