

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
