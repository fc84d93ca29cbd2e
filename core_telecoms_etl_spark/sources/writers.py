"""Sinks (SURVEY.md §2.1 S7–S10).

The reference lands everything as snappy Parquet on S3
(plugins/s3_copy.py:117-126, plugins/transform.py:120-135) and then COPYies
into Snowflake with case-insensitive by-name column matching and
DDL-inferred-from-first-file (plugins/snowflake_load.py:138-196). On Spark
the warehouse is the lakehouse itself: a normalized, partitioned Parquet
write IS the load, and the schema travels with the footers.

Scale notes:
- `partition_by` a low-cardinality date column (the reference's
  *GenerationDate columns) so downstream reads get partition pruning.
- Writers coalesce tiny outputs but never force a single file at scale;
  target file size is governed by upstream partitioning + AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from core_telecoms_etl_spark.operators.cleaning import normalize_column_names


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
    normalize: bool = True,
) -> None:
    """Append-merge parquet sink (reference: every daily file appended to
    the folder-table, README.md:23). Column names are normalized to
    lower_snake_case before the write so later multi-file scans resolve
    by-name across daily schema/case drift — the Spark analog of
    MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE (plugins/snowflake_load.py:191)."""
    out = normalize_column_names(df) if normalize else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
    normalize: bool = True,
) -> None:
    """ORC sink — symmetric with `readers.read_orc` for Hive/Trino
    interchange; same name-normalization and partition-folder semantics
    as `write_parquet`."""
    out = normalize_column_names(df) if normalize else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_table(
    df: DataFrame,
    name: str,
    *,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
    normalize: bool = True,
) -> None:
    """Catalog-table sink: replaces the reference's CREATE-TABLE-from-
    first-parquet + COPY INTO (plugins/snowflake_load.py:138-196).
    `saveAsTable` derives the DDL from the DataFrame schema natively.
    Optional bucketing pre-co-locates future joins on the bucket key —
    the shuffle the reference paid Snowflake for disappears."""
    out = normalize_column_names(df) if normalize else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    partition_by: Sequence[str] | None = None,
    normalize: bool = True,
) -> None:
    """JSON-Lines export sink — the interchange format trainer-side data
    loaders consume. Spark's json writer IS jsonl (one object per line,
    one file per partition); gzip by default since text JSONL is ~10×
    parquet. Columns normalize like every other sink so the exported
    keys are stable lower_snake_case."""
    out = normalize_column_names(df) if normalize else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_xml(
    df,
    dest: str,
    *,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "errorifexists",
) -> None:
    """XML sink (native in Spark 4) — the export half of the B2B
    interchange path; one `row_tag` element per row under
    `root_tag`, one file per partition like every Spark sink."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(dest)
    )


def write_avro(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """Avro sink, guarded exactly like `readers.read_avro` — the shared
    `require_avro` raises the one maintained actionable message."""
    from core_telecoms_etl_spark.sources.readers import require_avro

    require_avro(df.sparkSession)
    df.write.format("avro").mode(mode).save(path)
