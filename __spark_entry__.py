"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001 (smoke check);
`queries()` / `oracle_sql()` re-export the engine's declared operator
inventory (core_telecoms_etl_spark/queries/*, per SURVEY.md §2) for the
driver's DuckDB-differential correctness harness at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's star-schema shape (fact ⋈ broadcast
    dim → segment analytics) on sf0.001. Cleaning chain → broadcast join →
    hash aggregate, all one Catalyst plan."""
    from core_telecoms_etl_spark.operators.cleaning import clean

    orders = clean(
        spark.read.parquet(f"{SF_SMOKE_DIR}/orders.parquet"), dedup=False
    )
    customer = clean(
        spark.read.parquet(f"{SF_SMOKE_DIR}/customer.parquet"), dedup=False
    )
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            (F.round(F.sum("o_totalprice"), 2) / F.count("*")).alias(
                "avg_order_value"
            ),
        )
        .orderBy("c_mktsegment")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from core_telecoms_etl_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from core_telecoms_etl_spark import queries as q

    return q.oracle_sql()
