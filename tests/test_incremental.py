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


def test_manifest_schema(spark, tmp_path):
    loader = IncrementalLoader(spark, str(tmp_path / "manifest"))
    loader.run("f", ["a.parquet"], lambda fs: None)
    m = loader.manifest()
    assert m.columns == ["folder_name", "file_name", "loaded_at"]
    assert m.count() == 1
