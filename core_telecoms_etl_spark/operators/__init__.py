from core_telecoms_etl_spark.operators.cleaning import (
    clean,
    dedup_latest_by_key,
    dedup_rows,
    drop_all_null_rows,
    empty_guard,
    empty_strings_to_null,
    normalize_column_names,
    rename_columns,
    trim_strings,
)
from core_telecoms_etl_spark.operators.dq import (
    DQResult,
    check_accepted_values,
    check_not_null,
    check_unique,
    run_checks,
)

__all__ = [
    "DQResult",
    "check_accepted_values",
    "check_not_null",
    "check_unique",
    "clean",
    "dedup_latest_by_key",
    "dedup_rows",
    "drop_all_null_rows",
    "empty_guard",
    "empty_strings_to_null",
    "normalize_column_names",
    "rename_columns",
    "run_checks",
    "trim_strings",
]
