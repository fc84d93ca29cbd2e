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


def _morton_code_n(cols: "list[str]", bits: int) -> "Column":
    """Interleave the low `bits` of D non-negative ints into a Morton
    (Z-order) code — a pure JVM fold, no Python in the row path. Bit i
    of column d lands at position D*i + d; D*bits must fit a signed
    long (≤ 63)."""
    from pyspark.sql import functions as F

    d = len(cols)
    terms = " + ".join(
        f"(bigint(shiftleft(shiftright({c}, i) & 1, {d} * i + {j})))"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {terms})"
    )


def _morton_code(x_col: str, y_col: str, bits: int) -> "Column":
    """Two-column Morton code (see `_morton_code_n`)."""
    return _morton_code_n([x_col, y_col], bits)


def write_zordered(
    df,
    dest: str,
    *,
    cols: "tuple[str, ...]",
    n_files: int,
    bits: int = 16,
) -> None:
    """Write `df` clustered on an N-column Z-order (Morton) curve so
    parquet min/max stats prune files for predicates on ANY of the
    interleaved columns.

    A plain `sortBy(a)` layout gives perfect pruning on `a` and none on
    the rest; interleaving the bit-ranks of all D columns bounds each
    file to a small D-dimensional box, so point/range predicates on any
    dimension skip most files. Same layout contract as Delta/Iceberg
    OPTIMIZE ZORDER BY, expressed with stock Spark writes. Per-column
    resolution is min(bits, 63 // D) — each added dimension costs
    resolution on all of them (the classic z-order diminishing return;
    2-4 columns is the useful range).

    Each column is first normalized to a rank via its global min/max
    (1-row aggregate folded into the plan - no driver-side stats pass),
    then range-partitioned + sorted by the interleaved code so file
    boundaries follow the curve."""
    from pyspark.sql import functions as F

    if not 2 <= len(cols) <= 8:
        raise ValueError(f"z-order needs 2-8 columns, got {len(cols)}")
    bits = min(bits, 63 // len(cols))
    span = (1 << bits) - 1
    stats = df.agg(
        *[
            agg
            for i, c in enumerate(cols)
            for agg in (
                F.min(c).alias(f"__min{i}"),
                F.max(c).alias(f"__max{i}"),
            )
        ]
    )
    scaled = df.join(F.broadcast(stats))
    rank_cols = []
    for i, c in enumerate(cols):
        rc = f"__r{i}"
        scaled = scaled.withColumn(
            rc,
            F.floor(
                (F.col(c) - F.col(f"__min{i}"))
                * span
                / F.greatest(
                    F.col(f"__max{i}") - F.col(f"__min{i}"), F.lit(1)
                )
            ).cast("long"),
        )
        rank_cols.append(rc)
    scaled = scaled.withColumn("__z", _morton_code_n(rank_cols, bits))
    drop = (
        rank_cols
        + ["__z"]
        + [f"__min{i}" for i in range(len(cols))]
        + [f"__max{i}" for i in range(len(cols))]
    )
    (
        scaled.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop(*drop)
        .write.mode("errorifexists")
        .parquet(dest)
    )
