"""Table maintenance ops the lakehouse needs at scale (no reference
analog — the reference's daily files go straight to Snowflake; SURVEY.md
§2.1 notes our staging folders ARE the warehouse tables).

Small-file compaction: a year of daily appends × thousands of sources
leaves staging folders with file counts that throttle listing and
scheduling long before data size matters. Compaction rewrites a folder at
a target file size; downstream scans then get sane splits.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet folder, driver-side."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite `src` into `dest` with ≈target-sized files; returns the
    output file count. Writes to a NEW folder (never read-and-overwrite
    the same path — Spark scans lazily, so in-place overwrite would
    truncate its own input); callers swap folders atomically (rename) once
    the write commits.

    On a cluster, size-based splitting makes the repartition count from
    on-disk bytes a good proxy for in-memory batch size; compression drift
    is fine — the goal is escaping the many-tiny-files regime, not an
    exact size."""
    _, total = dir_stats(src)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    writer = df.repartition(n_files).write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)
    out_n, _ = dir_stats(dest)
    return out_n
