"""Deterministic sampling & dataset-split operators (north-star: a
training-data pipeline needs STABLE train/val/test assignment — the same
row must land in the same split on every run, every engine, every
cluster size; `df.sample()`'s seeded RNG is none of those across
engines/partitionings).

Mechanism: md5 of the id (+ salt), first 15 hex chars parsed as a long
(60 bits — fits a positive BIGINT in every ANSI engine), modulo the
bucket count. Portable: the exact same expression is expressible in
DuckDB/Trino/Snowflake SQL, so oracle checks are exact."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(
    col: Column | str, n_buckets: int = 10_000, salt: str = ""
) -> Column:
    """Stable bucket in [0, n_buckets) from md5 of the (salted) id string.
    Change `salt` to draw an independent assignment."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep ≈fraction of rows, stably: a row's membership depends only on
    its id and the salt. Pushes down as an ordinary filter — no RNG state,
    no per-partition seeds."""
    n = 1_000_000
    return df.filter(hash_bucket(id_col, n, salt) < int(fraction * n))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing
    primitive (downsample the over-represented language/source, keep the
    rare one whole). A row is kept iff its stable hash bucket falls under
    its stratum's fraction; strata not listed get `default_fraction`.
    Same membership on every run/engine/partitioning, and the predicate
    is an ordinary filter — no RNG state, nothing blocks pushdown."""
    n = 1_000_000
    bucket = hash_bucket(id_col, n, salt)
    thr = None
    for label, frac in fractions.items():
        cond = F.col(stratum_col) == label
        lit = F.lit(int(frac * n))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(int(default_fraction * n)))
    return df.filter(bucket < thr)


def dataset_split(
    df: DataFrame,
    id_col: str,
    *,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label ('train'/'val'/'test' by
    default, weights 0.8/0.1/0.1). Labels are cumulative bucket ranges, so
    enlarging one split keeps existing members (monotone assignment)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    n = 1_000_000
    bucket = hash_bucket(id_col, n, salt)
    expr = None
    acc = 0.0
    for label, w in weights.items():
        acc += w
        cond = bucket < int(acc * n)
        expr = (
            F.when(cond, label) if expr is None else expr.when(cond, label)
        )
    return df.withColumn(split_col, expr.otherwise(F.lit(None)))
