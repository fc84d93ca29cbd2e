"""Declared query inventory (SURVEY.md §2) — the driver-facing registry.

Each query is a `(pyspark_fn, duckdb_oracle_sql)` pair registered via the
`@query` decorator. `queries()` / `oracle_sql()` in `/root/repo/
__spark_entry__.py` re-export this registry for the driver's correctness
harness (row-count + schema + order-insensitive value-hash at sf0.01).

Determinism rules used throughout (so Spark and DuckDB hash-match):
- Row-level arithmetic is left UNROUNDED: both engines run the same IEEE
  ops on the same parquet doubles, producing bit-identical results.
- Aggregated sums ARE rounded, at the decimal grid of the true value
  (source money columns sit on an exact 2-decimal grid; products of two
  such columns on a 4-decimal grid). The accumulated float error from
  engine-specific summation order (≪ half a grid step) is snapped away,
  and grid values never sit on a round-half boundary.
- Derived ratios (avg = rounded-sum / count) are computed from the
  snapped sums so both engines divide bit-identical doubles.
- Integer-typed computed columns are cast to BIGINT on both sides.
- Window/top-k orderings always end in a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver's rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from core_telecoms_etl_spark.queries import (  # noqa: F401
        analytics,
        relational,
        scalar_funcs,
        quality,
        star,
        temporal,
        text,
        vector,
        events,
    )

    _LOADED = True
