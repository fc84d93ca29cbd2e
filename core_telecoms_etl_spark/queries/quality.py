"""Data-quality queries (SURVEY.md §2.12 Q1/Q2) — the dbt schema tests
(not_null / unique on business keys, dbt facts/schema.yml:7-26,
dimensions/schema.yml:5-9) as DataFrame aggregations returning violation
counts. Executed here against the driver tables in the same fact/dim roles
(orders/lineitem as facts, customer as dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_telecoms_etl_spark.queries import query
from core_telecoms_etl_spark.sources.readers import load_table


@query(
    "dq_not_null",
    oracle="""SELECT 'o_orderkey' AS column_name,
                     CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
              FROM orders
              UNION ALL
              SELECT 'o_custkey',
                     CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders
              UNION ALL
              SELECT 'o_totalprice',
                     CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders""",
)
def dq_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — not_null checks for three columns fused into ONE table scan
    (vs one compiled query per dbt test), unpivoted via stack()."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    counts = o.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(c)
            for c in cols
        ]
    )
    stack_expr = ", ".join(f"'{c}', {c}" for c in cols)
    return counts.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, violations)"
    )


@query(
    "dq_unique",
    oracle="""SELECT 'orders.o_orderkey' AS key_name,
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS duplicate_rows
              FROM (SELECT count(*) AS c FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1)
              UNION ALL
              SELECT 'lineitem.l_orderkey+l_linenumber',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT)
              FROM (SELECT count(*) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)""",
)
def dq_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — unique-key checks (single- and composite-key): count of excess
    duplicate rows per key. One hash aggregate per key, partial-agg'd."""

    def dup_count(df: DataFrame, key_name: str, *cols: str) -> DataFrame:
        return (
            df.groupBy(*cols)
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.lit(key_name).alias("key_name"),
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("long")
                .alias("duplicate_rows"),
            )
            .select("key_name", "duplicate_rows")
        )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return dup_count(orders, "orders.o_orderkey", "o_orderkey").unionByName(
        dup_count(
            lineitem,
            "lineitem.l_orderkey+l_linenumber",
            "l_orderkey",
            "l_linenumber",
        )
    )


@query(
    "dq_accepted_values",
    oracle="""SELECT 'o_orderstatus' AS column_name,
                     CAST(count(*) FILTER (
                       o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
                       AS n_violations,
                     count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
                       = 0 AS passed
              FROM orders""",
)
def dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt accepted_values check as a relation (sibling of dq_not_null /
    dq_unique): domain violations counted in one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    viol = F.sum(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    ).cast("long")
    return orders.agg(
        F.lit("o_orderstatus").alias("column_name"),
        viol.alias("n_violations"),
        (viol == 0).alias("passed"),
    )
