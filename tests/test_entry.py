"""Driver-contract tests: entry() smoke, registry completeness, and the
column-name contract between queries() and oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "c_mktsegment"


def test_every_oracle_key_has_a_query():
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 50


def test_queries_run_at_smallest_sf(spark, sf_dir):
    """Every declared query executes and yields a stable schema at
    sf0.001 (the driver's smoke scale). Row counts may be 0 (e.g.
    anti-joins) but execution must succeed."""
    qs = e.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(5).collect()
