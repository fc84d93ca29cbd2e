"""Declarative data-quality checks (SURVEY.md §2.12 Q1/Q2).

The reference's only correctness mechanism is dbt schema tests — not_null
and unique on business keys (dbt/coretelecom/models/facts/schema.yml:7-26,
dimensions/schema.yml:5-9), compiled to SQL and run by `dbt test`. Here each
check is a DataFrame aggregation returning a violation count, so a whole
suite collapses into a handful of scans; `violations_df` exposes the same
result as a DataFrame for the declared `dq_not_null` / `dq_unique` queries.

Scale: each unique check is one hash aggregate on the key (map-side partial
combine, AQE-coalesced); not_null checks on the same table are fused into a
single pass via `run_checks`'s grouped aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DQResult:
    check: str
    column: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def check_not_null(df: DataFrame, columns: Sequence[str]) -> list[DQResult]:
    """NULL-count per column in ONE pass (vs one query per dbt test)."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    return [DQResult("not_null", c, int(row[c] or 0)) for c in columns]


def check_unique(df: DataFrame, columns: Sequence[str]) -> list[DQResult]:
    """Duplicate-key count per key (each key is one hash aggregate)."""
    out = []
    for c in columns:
        dup = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("v"))
            .collect()[0]["v"]
        )
        out.append(DQResult("unique", c, int(dup)))
    return out


def check_accepted_values(
    df: DataFrame, column: str, values: Sequence[str]
) -> list[DQResult]:
    """dbt accepted_values analog (capability; no instance in the ref)."""
    n = df.filter(~F.col(column).isin(list(values)) & F.col(column).isNotNull()).count()
    return [DQResult("accepted_values", column, int(n))]


def run_checks(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
) -> list[DQResult]:
    results: list[DQResult] = []
    if not_null:
        results.extend(check_not_null(df, not_null))
    if unique:
        results.extend(check_unique(df, unique))
    return results


def violations_df(spark: SparkSession, results: Sequence[DQResult]) -> DataFrame:
    """Materialize check results as a DataFrame (for the declared queries)."""
    return spark.createDataFrame(
        [(r.check, r.column, r.violations) for r in results],
        "check_name string, column_name string, violations bigint",
    )
