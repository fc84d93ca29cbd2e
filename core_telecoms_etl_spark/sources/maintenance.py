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


def _morton_code(x_col: str, y_col: str, bits: int) -> "Column":
    """Interleave the low `bits` of two non-negative ints into a Morton
    (Z-order) code — a pure JVM fold, no Python in the row path."""
    from pyspark.sql import functions as F

    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + (bigint(shiftleft(shiftright({x_col}, i) & 1, 2 * i)))"
        f"    + (bigint(shiftleft(shiftright({y_col}, i) & 1, 2 * i + 1))))"
    )


def write_zordered(
    df,
    dest: str,
    *,
    cols: tuple[str, str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` clustered on a two-column Z-order (Morton) curve so
    parquet min/max stats prune files for predicates on EITHER column.

    A plain `sortBy(a)` layout gives perfect pruning on `a` and none on
    `b`; interleaving the bit-ranks of both columns bounds each file to a
    small rectangle of (a, b) space, so point/range predicates on either
    dimension skip most files. This is the same layout contract as
    Delta/Iceberg OPTIMIZE ZORDER BY, expressed with stock Spark writes.

    Each column is first normalized to a `bits`-bit rank via its global
    min/max (two 1-row aggregates folded into the plan — no driver-side
    stats pass), then range-partitioned + sorted by the interleaved code
    so file boundaries follow the curve."""
    from pyspark.sql import functions as F

    a, b = cols
    span = (1 << bits) - 1
    stats = df.agg(
        F.min(a).alias("__amin"),
        F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"),
        F.max(b).alias("__bmax"),
    )
    scaled = (
        df.join(F.broadcast(stats))
        .withColumn(
            "__ax",
            F.floor(
                (F.col(a) - F.col("__amin"))
                * span
                / F.greatest(F.col("__amax") - F.col("__amin"), F.lit(1))
            ).cast("long"),
        )
        .withColumn(
            "__bx",
            F.floor(
                (F.col(b) - F.col("__bmin"))
                * span
                / F.greatest(F.col("__bmax") - F.col("__bmin"), F.lit(1))
            ).cast("long"),
        )
        .withColumn("__z", _morton_code("__ax", "__bx", bits))
    )
    (
        scaled.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ax", "__bx", "__z", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode("errorifexists")
        .parquet(dest)
    )
