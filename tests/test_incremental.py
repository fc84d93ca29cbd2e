"""IncrementalLoader tests (SURVEY.md §5.2): the idempotency assertion the
reference only implements as runtime skip-logging — run the load twice,
the second run must process zero files."""

from __future__ import annotations

from core_telecoms_etl_spark.sources.incremental import IncrementalLoader


def test_incremental_idempotent(spark, tmp_path):
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    processed: list[list[str]] = []

    files = ["a.parquet", "b.parquet", "notes.txt"]
    r1 = loader.run("call_logs", files, processed.append)
    assert r1.candidates == 2  # .txt filtered by the suffix predicate
    assert sorted(r1.new_files) == ["a.parquet", "b.parquet"]
    assert processed == [r1.new_files]

    r2 = loader.run("call_logs", files, processed.append)
    assert r2.new_files == [] and r2.skipped == 2
    assert len(processed) == 1  # process() not called again


def test_incremental_new_files_only(spark, tmp_path):
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    loader.run("f", ["day1.csv"], lambda fs: None)
    r = loader.run("f", ["day1.csv", "day2.csv"], lambda fs: None)
    assert r.new_files == ["day2.csv"] and r.skipped == 1


def test_incremental_folders_independent(spark, tmp_path):
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    loader.run("folder_a", ["x.json"], lambda fs: None)
    r = loader.run("folder_b", ["x.json"], lambda fs: None)
    assert r.new_files == ["x.json"]  # same name, different folder


def test_new_files_df_end_to_end_without_collect(spark, tmp_path):
    """The DataFrame-primary path: a distributed candidate listing goes
    discovery → anti-join → manifest commit with no driver materialization
    of file names (only counts cross to the driver)."""
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))

    listing = spark.createDataFrame(
        [(f"part-{i:05d}.parquet",) for i in range(500)], "file_name string"
    )
    new = loader.new_files_df("bulk", listing)
    assert new.columns == ["folder_name", "file_name"]
    assert new.count() == 500
    loader.record_df(new)

    # second discovery over the same listing: everything already recorded
    assert loader.new_files_df("bulk", listing).count() == 0
    # a fresh file shows up; recorded entries stay suppressed
    more = listing.unionByName(
        spark.createDataFrame([("part-99999.parquet",)], "file_name string")
    )
    again = loader.new_files_df("bulk", more)
    assert [r.file_name for r in again.collect()] == ["part-99999.parquet"]
    assert loader.manifest().count() == 500


def test_manifest_schema(spark, tmp_path):
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    loader.run("f", ["a.parquet"], lambda fs: None)
    m = loader.manifest()
    assert m.columns == ["folder_name", "file_name", "loaded_at"]
    assert m.count() == 1


def test_streaming_incremental_checkpoint_skips_processed(spark, tmp_path):
    """The checkpointed file-source variant of incremental loading: run
    twice → second run reprocesses nothing; add a file → only it loads."""
    from core_telecoms_etl_spark.operators.cleaning import clean
    from core_telecoms_etl_spark.sources.incremental import (
        streaming_incremental_load,
    )

    src = tmp_path / "raw"
    src.mkdir()
    (src / "day1.csv").write_text("id,name\n1, a \n2,b\n")
    dest = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, name string"

    def run():
        return streaming_incremental_load(
            spark,
            str(src),
            dest,
            ckpt,
            schema=schema,
            transform=lambda df: clean(df, dedup=False),
        )

    run()
    assert spark.read.parquet(dest).count() == 2
    # values went through the cleaning chain (trim)
    assert {r.name for r in spark.read.parquet(dest).collect()} == {"a", "b"}

    run()  # no new files → no appended rows
    assert spark.read.parquet(dest).count() == 2

    (src / "day2.csv").write_text("id,name\n3,c\n")
    run()
    assert spark.read.parquet(dest).count() == 3
    assert {r.id for r in spark.read.parquet(dest).collect()} == {1, 2, 3}


def test_run_notification_hooks_and_retry(spark, tmp_path):
    """The pipeline-level orchestration hooks (VERDICT r11 ask #7 — the
    reference's email-on-success/failure + task-retry behavior,
    airflow/dags/pipeline.py:20-43,110,240-264), kept OUT of the query
    surface: a flaky `process` that fails once is retried, the manifest
    is recorded only after the successful attempt, and the success
    notification reports attempts=2."""
    from core_telecoms_etl_spark.sources.incremental import RunNotification

    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    events: list[RunNotification] = []
    calls = {"n": 0}

    def flaky(files: list[str]) -> None:
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")

    r = loader.run(
        "f",
        ["a.parquet"],
        flaky,
        retries=1,
        on_success=events.append,
        on_failure=events.append,
    )
    assert calls["n"] == 2  # failed once, retried once
    assert [e.status for e in events] == ["success"]
    n = events[0]
    assert n.attempts == 2 and n.folder == "f" and n.error is None
    assert n.report is r and r.new_files == ["a.parquet"]
    # recorded exactly once despite the retry
    assert loader.manifest().count() == 1


def test_run_failure_notifies_then_raises_and_keeps_files_new(
    spark, tmp_path
):
    """Exhausted retries: on_failure observes the error (it never
    swallows it), the exception re-raises, the manifest records
    NOTHING — so the same files are offered again on the next run
    (the reference's retry-then-alert semantics, never data loss)."""
    import pytest

    from core_telecoms_etl_spark.sources.incremental import RunNotification

    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    events: list[RunNotification] = []

    def boom(files: list[str]) -> None:
        raise ValueError("bad batch")

    with pytest.raises(ValueError, match="bad batch"):
        loader.run(
            "f",
            ["a.parquet"],
            boom,
            retries=2,
            on_success=events.append,
            on_failure=events.append,
        )
    assert [e.status for e in events] == ["failure"]
    assert events[0].attempts == 3  # 1 try + 2 retries
    assert isinstance(events[0].error, ValueError)
    assert events[0].report is None
    assert loader.manifest().count() == 0  # nothing recorded

    # the failed batch is still "new" — a fixed process picks it up
    r = loader.run("f", ["a.parquet"], lambda fs: None)
    assert r.new_files == ["a.parquet"]


def test_run_success_hook_on_empty_batch(spark, tmp_path):
    """No new files → process never runs (attempts=0) but the success
    hook still fires with the zero-work report, so a scheduler can
    distinguish 'ran, nothing to do' from 'never ran'."""
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    loader.run("f", ["a.parquet"], lambda fs: None)

    events = []
    r = loader.run(
        "f", ["a.parquet"], lambda fs: None, on_success=events.append
    )
    assert r.new_files == [] and r.skipped == 1
    assert len(events) == 1
    assert events[0].status == "success" and events[0].attempts == 0
