"""Partitioned-layout pruning + small-file compaction tests — the IO-side
scale behaviors (partition pruning has data to bite on only when the
layout is partitioned; compaction escapes the many-tiny-files regime)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from core_telecoms_etl_spark.sources.maintenance import (
    compact_parquet,
    dir_stats,
)
from core_telecoms_etl_spark.sources.readers import load_table


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_enables_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-02")
    plan = _formatted(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan
    # the partition filter must NOT appear as a pushed data filter — it is
    # resolved at file-listing time, before any row is read
    day1 = pruned.count()
    total = spark.read.parquet(out).count()
    assert 0 < day1 < total


def test_compaction_reduces_file_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    # simulate 30 daily appends of a small batch → 30+ tiny files
    for day in range(30):
        spark.range(day * 100, (day + 1) * 100).selectExpr(
            "id", "id % 7 AS k"
        ).coalesce(1).write.mode("append").parquet(src)
    n_before, size = dir_stats(src)
    assert n_before >= 30

    dest = str(tmp_path / "compacted")
    n_after = compact_parquet(
        spark, src, dest, target_file_bytes=max(size, 1)
    )
    assert n_after == 1
    assert (
        spark.read.parquet(dest).count()
        == spark.read.parquet(src).count()
        == 3000
    )


def test_zorder_write_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering bounds every output file to a small rectangle of
    (orderkey, partkey) space: parquet min/max stats prune a majority of
    row groups for point predicates on EITHER column, where a linear sort
    prunes only its own sort key. Also a pure rewrite: row set unchanged."""
    import glob

    import pyarrow.parquet as pq

    from core_telecoms_etl_spark.sources.maintenance import write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zdir = str(tmp_path / "z")
    write_zordered(li, zdir, cols=("l_orderkey", "l_partkey"), n_files=16)

    back = spark.read.parquet(zdir)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)

    def matching_fraction(col, probes):
        files = sorted(glob.glob(zdir + "/*.parquet"))
        hits = total = 0
        for v in probes:
            for f in files:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    for ci in range(md.row_group(rg).num_columns):
                        c = md.row_group(rg).column(ci)
                        if c.path_in_schema == col:
                            total += 1
                            if c.statistics.min <= v <= c.statistics.max:
                                hits += 1
        return hits / total

    lo_o, hi_o = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo_p, hi_p = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    probes_o = [lo_o + (hi_o - lo_o) * q // 10 for q in (1, 5, 9)]
    probes_p = [lo_p + (hi_p - lo_p) * q // 10 for q in (1, 5, 9)]
    # both dimensions prune: a point predicate touches well under the 100%
    # of row groups an unsorted/wrong-sorted layout would scan
    assert matching_fraction("l_orderkey", probes_o) < 0.6
    assert matching_fraction("l_partkey", probes_p) < 0.6


def test_zorder_three_columns_prune_all_dims(spark, sf_dir, tmp_path):
    """The N-column generalization: three interleaved columns all get
    min/max pruning (at reduced per-column resolution, 63//3 = 21
    bits — still far above the 16-bit rank grid)."""
    import glob

    import pyarrow.parquet as pq

    from core_telecoms_etl_spark.sources.maintenance import write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "z3")
    write_zordered(
        li, zdir, cols=("l_orderkey", "l_partkey", "l_suppkey"), n_files=16
    )
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()

    files = sorted(glob.glob(zdir + "/*.parquet"))

    def matching_fraction(col, probes):
        hits = total = 0
        for v in probes:
            for f in files:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    for ci in range(md.row_group(rg).num_columns):
                        c = md.row_group(rg).column(ci)
                        if c.path_in_schema == col:
                            total += 1
                            if c.statistics.min <= v <= c.statistics.max:
                                hits += 1
        return hits / total

    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        lo, hi = li.agg(F.min(col), F.max(col)).first()
        probes = [lo + (hi - lo) * q // 10 for q in (1, 5, 9)]
        assert matching_fraction(col, probes) < 0.75, col
