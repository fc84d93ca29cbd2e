"""Star-schema query: exercises the model registry end-to-end (staging →
dims → fact with join-as-filter semantics) against a pure-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from core_telecoms_etl_spark.plans.star import build_star_models
from core_telecoms_etl_spark.queries import query


@query(
    "star_fact_complaints",
    oracle="""WITH f AS (
                SELECT o_orderkey AS complaint_id,
                       o_custkey AS customer_id,
                       o_orderkey % (SELECT count(*) FROM supplier) AS agent_id,
                       o_orderpriority AS complaint_category,
                       o_orderstatus AS resolution_status,
                       o_orderdate AS request_date,
                       o_totalprice AS resolution_cost
                FROM orders)
              SELECT complaint_id, customer_id, agent_id, complaint_category,
                     resolution_status, request_date, resolution_cost
              FROM f
              WHERE EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = f.customer_id)
                AND EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = f.agent_id)""",
)
def star_fact_complaints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the whole model DAG through the registry (topological order,
    dims before facts, per-model materialization) and returns the fact."""
    return build_star_models(spark, sf_dir)["fact_complaints"]
