"""SQL catalog surface: register the engine's tables as views so the
whole query surface is reachable from `spark.sql(...)` — the Spark analog
of the reference's Snowflake database that dbt models query by name
(SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from core_telecoms_etl_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
)


def register_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> list[str]:
    """Register each test table (default: all) as a temp view named after
    the table. Views are lazy — registration costs nothing until queried,
    and every SQL query against them gets the same pushdown/pruning as
    the DataFrame API."""
    names = names or TESTDATA_TABLES
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return list(names)


def sql(spark: SparkSession, sf_dir: str, query: str):
    """Run ANSI SQL against the registered tables (registering them
    first). The convenience entry point for SQL-first users."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
