"""core_telecoms_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (telecom complaint analytics: multi-format ingestion,
incremental duplicate-safe loading, cleaning transforms, star-schema
construction, declarative data-quality checks), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout:
    session     — SparkSession builder tuned for local and cluster runs
    sources     — readers (csv/json/parquet/jdbc/sheets-shim), writers,
                  incremental manifest loader
    operators   — cleaning, dedup, data-quality, similarity, text analysis
    functions   — scalar/aggregate helper expressions (JVM-side, codegen'd)
    plans       — dbt-style model registry + the telecom star schema
    streaming   — event-time windowed aggregation (batch & structured
                  streaming variants)
    queries     — the declared operator inventory registered with the
                  driver harness (SURVEY.md §2)
"""

from core_telecoms_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
