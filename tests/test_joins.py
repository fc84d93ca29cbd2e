"""Join-strategy helper tests: salted join/groupby equivalence to the
unsalted plans, and the bucketed co-located join producing a shuffle-free
physical plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators import joins as J
from core_telecoms_etl_spark.sources.readers import load_table


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    salted = J.salted_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.withColumnRenamed("c_custkey", "custkey"),
        "custkey",
        salt_from="o_orderkey",
        n_salts=7,
    ).count()
    assert salted == plain


def test_salted_groupby_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderstatus: (r.n, round(r.s, 2))
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    salted = {
        r.o_orderstatus: (r.n, round(r.sum_o_totalprice, 2))
        for r in J.salted_groupby(
            orders,
            ["o_orderstatus"],
            salt_from="o_orderkey",
            n_salts=7,
            sums=["o_totalprice"],
        ).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    J.write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_bkt",
        bucket_cols=["o_custkey"],
        n_buckets=4,
        sort_cols=["o_custkey"],
    )
    J.write_bucketed(
        customer.select("c_custkey", "c_mktsegment"),
        "t_customer_bkt",
        bucket_cols=["c_custkey"],
        n_buckets=4,
        sort_cols=["c_custkey"],
    )
    a = spark.table("t_orders_bkt")
    b = spark.table("t_customer_bkt")
    # disable auto-broadcast so the co-location (not size) is what's tested
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_custkey == b.c_custkey)
        plan = _formatted(joined)
        assert not re.findall(r"\(\d+\) Exchange\b", plan), plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_customer_bkt")
