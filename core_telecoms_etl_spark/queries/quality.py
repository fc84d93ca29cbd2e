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
    "dq_suite",
    oracle="""SELECT 'not_null' AS check_type, 'orders.' || col AS target,
                     v AS violations, v = 0 AS passed
              FROM (
                SELECT unnest(['o_orderkey', 'o_custkey', 'o_totalprice']) AS col,
                       unnest([
                         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       ]) AS v
                FROM orders)
              UNION ALL
              SELECT 'unique', 'orders.o_orderkey',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT),
                     coalesce(sum(c - 1), 0) = 0
              FROM (SELECT count(*) AS c FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1)
              UNION ALL
              SELECT 'unique', 'lineitem.l_orderkey+l_linenumber',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT),
                     coalesce(sum(c - 1), 0) = 0
              FROM (SELECT count(*) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
              UNION ALL
              SELECT 'accepted_values', 'orders.o_orderstatus',
                     CAST(count(*) FILTER (
                       o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
                     count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) = 0
              FROM orders""",
)
def dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q2 — the dbt schema-test suite as ONE relation of
    (check_type, target, violations, passed):

    - not_null on three orders columns, fused into a single table scan
      (vs one compiled query per dbt test), unpivoted via stack();
    - unique on a single key (orders.o_orderkey) and a composite key
      (lineitem.l_orderkey+l_linenumber) — excess-duplicate-row counts,
      one partial-agg'd hash aggregate per key;
    - accepted_values on orders.o_orderstatus — domain violations in the
      same scan-and-aggregate shape.

    Per-branch scans stay independent so each check still pushes its own
    column pruning to parquet; the union is a plan concat, not a shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # not_null: one scan, all columns aggregated at once, then unpivot
    nn_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    nn_counts = orders.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(c)
            for c in nn_cols
        ]
    )
    stack_expr = ", ".join(f"'orders.{c}', {c}" for c in nn_cols)
    not_null = nn_counts.selectExpr(
        f"stack({len(nn_cols)}, {stack_expr}) as (target, violations)"
    ).select(
        F.lit("not_null").alias("check_type"),
        "target",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )

    def dup_count(df: DataFrame, key_name: str, *cols: str) -> DataFrame:
        excess = F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long")
        return (
            df.groupBy(*cols)
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.lit("unique").alias("check_type"),
                F.lit(key_name).alias("target"),
                excess.alias("violations"),
                (excess == 0).alias("passed"),
            )
            .select("check_type", "target", "violations", "passed")
        )

    uniq = dup_count(orders, "orders.o_orderkey", "o_orderkey").unionByName(
        dup_count(
            lineitem,
            "lineitem.l_orderkey+l_linenumber",
            "l_orderkey",
            "l_linenumber",
        )
    )

    av_viol = F.sum(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    ).cast("long")
    accepted = orders.agg(
        F.lit("accepted_values").alias("check_type"),
        F.lit("orders.o_orderstatus").alias("target"),
        av_viol.alias("violations"),
        (av_viol == 0).alias("passed"),
    )

    return not_null.unionByName(uniq).unionByName(accepted)


@query(
    "profile_table",
    oracle="""WITH base AS (SELECT * FROM lineitem)
              SELECT 'l_quantity' AS "column", count(*) AS n_rows,
                     count(*) - count(l_quantity) AS n_nulls,
                     count(DISTINCT l_quantity) AS n_distinct,
                     CAST(min(l_quantity) AS DOUBLE) AS min_num,
                     CAST(max(l_quantity) AS DOUBLE) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str,
                     CAST(NULL AS VARCHAR) AS max_str
              FROM base
              UNION ALL
              SELECT 'l_extendedprice', count(*),
                     count(*) - count(l_extendedprice),
                     count(DISTINCT l_extendedprice),
                     CAST(min(l_extendedprice) AS DOUBLE),
                     CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL
              FROM base
              UNION ALL
              SELECT 'l_orderkey', count(*),
                     count(*) - count(l_orderkey),
                     count(DISTINCT l_orderkey),
                     CAST(min(l_orderkey) AS DOUBLE),
                     CAST(max(l_orderkey) AS DOUBLE), NULL, NULL
              FROM base
              UNION ALL
              SELECT 'l_returnflag', count(*),
                     count(*) - count(l_returnflag),
                     count(DISTINCT l_returnflag), NULL, NULL,
                     min(l_returnflag), max(l_returnflag)
              FROM base
              UNION ALL
              SELECT 'l_linestatus', count(*),
                     count(*) - count(l_linestatus),
                     count(DISTINCT l_linestatus), NULL, NULL,
                     min(l_linestatus), max(l_linestatus)
              FROM base""",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/dbt-profile-style per-column statistics (operators/dq.py
    profile_columns): null counts, exact distinct counts, typed extrema
    for five lineitem columns — one aggregation pass over one scan (the
    oracle's five UNION ALL scans compute the same relation)."""
    from core_telecoms_etl_spark.operators.dq import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "lineitem"),
        numeric_cols=("l_quantity", "l_extendedprice", "l_orderkey"),
        string_cols=("l_returnflag", "l_linestatus"),
    )
