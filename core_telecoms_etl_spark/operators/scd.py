"""Slowly-changing-dimension + upsert operators (capability extensions:
the reference's star schema is rebuild-from-scratch each run — real
warehouse dims need SCD-2 history and MERGE/upsert semantics; SURVEY.md
§2.9 D4 covers only keep-latest).

Scale design: both ops are one shuffle on the business key. SCD-2 is a
window lead over (key, ts); upsert is unionByName + keep-latest — no
row-at-a-time MERGE loop, and the write is a full partition rewrite
(plain parquet has no transactional row updates; on Delta/Iceberg the
same logical op maps to MERGE INTO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    change_cols: list[str] | None = None,
) -> DataFrame:
    """Build SCD-2 validity intervals from a change-event stream: each
    (key, ts) version is valid from its own timestamp until the next
    version's (NULL for the current version), with `is_current` flagging
    the open row. One window over (key, ts) — single shuffle."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    out = changes.select(
        *key_cols,
        *(change_cols or [c for c in changes.columns if c not in key_cols and c != ts_col]),
        F.col(ts_col).alias("valid_from"),
    ).withColumn("valid_to", F.lead("valid_from").over(
        Window.partitionBy(*key_cols).orderBy(F.col("valid_from").asc())
    ))
    _ = w
    return out.withColumn("is_current", F.col("valid_to").isNull())


def upsert(
    target: DataFrame,
    updates: DataFrame,
    *,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """MERGE-style upsert as a relational plan: rows from `updates` win
    over `target` rows with the same key; among duplicates the highest
    `version_col` (then source priority) survives. Returns the merged
    relation — callers overwrite-swap the target path (or MERGE INTO on
    a transactional table format)."""
    t = target.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    both = t.unionByName(u, allowMissingColumns=True)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
