from core_telecoms_etl_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    read_rows,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_rows",
]
