"""IncrementalLoader — file-granular, duplicate-safe incremental loading
(SURVEY.md §2.3 J4/J5, §4.2; the one genuinely custom component).

The reference guarantees idempotency with three layers of skip-processed-file
logic: raw-copy key-set difference (plugins/s3_copy.py:84-99), staging
head_object existence checks (plugins/transform.py:161-169), and a
PROCESSED_FILES warehouse ledger probed per file
(plugins/snowflake_load.py:64-69,108-133,179-199). All three are the same
semantic operation — an anti-join of candidate files against a manifest —
done row-at-a-time over the network.

Here it is ONE set-at-a-time operation: list source files → left_anti join
against the manifest parquet → process only new files → append manifest
entries. At 100 TB the manifest is thousands-to-millions of rows (one per
file), always tiny relative to data, so the anti-join broadcasts.

Crash-safety without a transactional table format: data is written BEFORE the
manifest entry, so a crash between the two re-processes that batch's files on
retry; paired with deterministic output naming (or an idempotent sink) this
yields effectively-once. With Delta/Iceberg available, the manifest commit
and data write would share a transaction; this module keeps the plain-parquet
contract of the harness.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "folder_name string, file_name string, loaded_at timestamp"


@dataclass
class LoadReport:
    candidates: int
    new_files: list[str]
    skipped: int


@dataclass
class RunNotification:
    """What a pipeline-level notification hook receives — the analog of
    the reference's success/failure email payloads
    (airflow/dags/pipeline.py:20-43,240-264), minus the transport: the
    engine reports, the caller decides whether that means email, a
    metrics counter, or nothing. `attempts` counts `process` executions
    (1 = first try succeeded), mirroring the reference's task-retry
    counter (pipeline.py:110)."""

    status: str  # "success" | "failure"
    folder: str
    report: LoadReport | None
    error: Exception | None
    attempts: int


class IncrementalLoader:
    """Manifest-backed incremental file loader.

    manifest table: (folder_name, file_name, loaded_at) — the reference's
    PROCESSED_FILES ledger (plugins/snowflake_load.py:64-69) as parquet.
    """

    def __init__(self, spark: SparkSession, manifest_path: str) -> None:
        self.spark = spark
        self.manifest_path = manifest_path

    def manifest(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.manifest_path)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def new_files_df(
        self, folder: str, files: Sequence[str] | DataFrame
    ) -> DataFrame:
        """PRIMARY interface — set-at-a-time discovery: candidates ∖
        manifest via left_anti (replaces the reference's per-file COUNT(*)
        ledger probe, plugins/snowflake_load.py:108-121). The manifest side
        is broadcast — no shuffle of the candidate list. Returns a
        DataFrame of (folder_name, file_name) that never touches the
        driver: at the millions-of-files end, feed it straight to
        `record_df` / downstream joins and collect only counts.

        `files` may be a Sequence[str] of names (small case) or a
        DataFrame with a `file_name` column (e.g. a listing table), which
        stays distributed end-to-end."""
        if isinstance(files, DataFrame):
            cand = files.select(
                F.lit(folder).alias("folder_name"), "file_name"
            )
        else:
            cand = self.spark.createDataFrame(
                [(folder, f) for f in files],
                "folder_name string, file_name string",
            )
        return cand.join(
            F.broadcast(self.manifest()),
            ["folder_name", "file_name"],
            "left_anti",
        )

    def new_files(self, folder: str, files: Sequence[str]) -> list[str]:
        """List helper over `new_files_df` for small candidate sets (the
        common per-batch case, where the new-file names must reach the
        driver anyway to build the read paths)."""
        if not files:
            return []
        return [
            r.file_name
            for r in self.new_files_df(folder, files)
            .select("file_name")
            .collect()
        ]

    def record_df(self, new_df: DataFrame) -> None:
        """Append manifest entries straight from the (folder_name,
        file_name) DataFrame — no driver round-trip; the new-file set
        stays distributed from discovery through commit."""
        new_df.select("folder_name", "file_name").withColumn(
            "loaded_at", F.current_timestamp()
        ).write.mode("append").parquet(self.manifest_path)

    def record(self, folder: str, files: Sequence[str]) -> None:
        if not files:
            return
        self.record_df(
            self.spark.createDataFrame(
                [(folder, f) for f in files],
                "folder_name string, file_name string",
            )
        )

    def run(
        self,
        folder: str,
        files: Sequence[str],
        process: Callable[[list[str]], None],
        *,
        extensions: Sequence[str] = (".parquet", ".csv", ".json"),
        retries: int = 0,
        on_success: Callable[[RunNotification], None] | None = None,
        on_failure: Callable[[RunNotification], None] | None = None,
    ) -> LoadReport:
        """Filter candidates by extension (the reference's suffix predicate,
        plugins/s3_copy.py:92-93), anti-join against the manifest, process
        all new files as ONE multi-file batch, then record them. The
        `process` callback takes the new-file list (it must build reader
        paths on the driver regardless); the manifest bookkeeping itself
        runs through the DataFrame path.

        Orchestration hooks (VERDICT r11 ask #7 — the reference's one
        behavior with no engine analog, airflow/dags/pipeline.py:20-43,
        110,240-264), deliberately OUTSIDE the query surface:

        - `retries`: re-run a failing `process` up to this many extra
          times (the reference's task `retries=1`). The manifest is
          recorded only after a SUCCESSFUL process, so a retried batch
          re-reads the same new-file list — idempotency unchanged.
        - `on_success` / `on_failure`: called once with a
          `RunNotification` (the email-on-success/failure analog).
          After exhausted retries the original exception re-raises —
          a notification hook observes failure, it never swallows it.
          Hook exceptions propagate (a misconfigured notifier should
          be loud, matching the reference's failing email task)."""
        candidates = [
            f for f in files if os.path.splitext(f)[1].lower() in extensions
        ]
        new = self.new_files(folder, candidates)
        attempts = 0
        if new:
            while True:
                attempts += 1
                try:
                    process(new)
                    break
                except Exception as e:
                    if attempts > retries:
                        if on_failure is not None:
                            on_failure(
                                RunNotification(
                                    "failure", folder, None, e, attempts
                                )
                            )
                        raise
            self.record(folder, new)
        report = LoadReport(
            candidates=len(candidates),
            new_files=new,
            skipped=len(candidates) - len(new),
        )
        if on_success is not None:
            on_success(
                RunNotification(
                    "success", folder, report, None, attempts
                )
            )
        return report


def streaming_incremental_load(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    *,
    schema: str,
    fmt: str = "csv",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    options: dict[str, str] | None = None,
) -> int:
    """The Spark-NATIVE incremental loader (SURVEY.md §1.5(b)): a
    file-source readStream with Trigger.AvailableNow — the checkpoint's
    file log replaces the manifest table entirely, exactly-once per file
    comes from the streaming commit protocol, and the run returns when
    all currently-available files are processed (batch-job ergonomics).

    Use this when the destination is file/Delta-like and the cleaning is
    per-row (foreachBatch applies `transform` to each micro-batch).
    The manifest `IncrementalLoader` remains for sinks that need custom
    commit coordination or human-auditable load ledgers.

    Returns the number of micro-batches executed in this run."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    stream = reader.load(src_dir)
    n_batches = 0

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        out = transform(batch_df) if transform else batch_df
        out.write.mode("append").parquet(dest_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches
