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


def test_check_order_is_exact_and_duplicate_free():
    """_CHECK_ORDER must list every registry entry exactly once: a
    missing name silently falls to the tail (out of its curated
    window slot — the r6 json_scan near-miss), a duplicate shifts
    every later query's window position."""
    from collections import Counter

    from core_telecoms_etl_spark import queries as q

    q._load_all()
    counts = Counter(q._CHECK_ORDER)
    dups = [n for n, c in counts.items() if c > 1]
    assert not dups, f"duplicated in _CHECK_ORDER: {dups}"
    missing = set(q.REGISTRY) - set(q._CHECK_ORDER)
    assert not missing, f"registered but not in _CHECK_ORDER: {missing}"


def test_r7_window_head_is_exactly_50():
    """The driver samples the first 50 registry entries. The r6 window
    comment claimed 'exactly 50' but the head was 51, silently dropping
    quality_filter (ADVICE r6) — pin the intended boundary and the
    rotation content: every r1-stale query (the MEASURED 33-query set
    from tools/gen_inventory.last_green_rounds, not the VERDICT's
    30-query narrative) must be inside the window."""
    import importlib.util
    import os

    from core_telecoms_etl_spark import queries as q

    q._load_all()
    head = list(q._CHECK_ORDER[:50])
    assert head[0] == "key_skew_profile"
    assert "quality_filter" in head, "quality_filter dropped again"

    # import by absolute path (anchored to this file, not the cwd) so
    # pytest runs from any directory and sys.path stays clean
    inv_path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "gen_inventory.py"
    )
    spec = importlib.util.spec_from_file_location("gen_inventory", inv_path)
    gen_inventory = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_inventory)
    last_green_rounds = gen_inventory.last_green_rounds

    green = last_green_rounds()
    r1_stale = {n for n in q.REGISTRY if green.get(n) == 1}
    missed = r1_stale - set(head)
    assert not missed, f"r1-stale queries outside the window: {missed}"
    # The five r7 extension queries deliberately yield their window
    # slots to the 33-query r1-stale rotation (the r6 VERDICT's
    # explicit priority); they lead the r8 rotation instead and are
    # differential-verified at sf0.001/0.01/0.1 in the meantime.
    deferred_to_r8 = {
        "bloom_prune_semi_join", "bm25_retrieval", "winsorize_features",
        "attribution_last_touch", "erasure_cascade", "stream_sliding",
        "prefix_filter_near_dup", "pagerank_copurchase",
        "grouping_sets_agg", "zorder_locality",
        "chi_square_independence", "entropy_by_group",
        "cusum_changepoint", "grouped_trend",
        "mann_whitney_u", "gini_concentration",
        "seasonal_naive_forecast", "kaplan_meier",
        "triangle_count", "node_jaccard_similarity",
        "zipf_profile", "keyword_pmi",
        "lexical_diversity", "containment_near_dup",
        "knn_classify", "order_price_consistency",
        "functional_dependency", "interarrival_stats",
        "bootstrap_ci", "ewma_control_chart",
        "recursive_hierarchy_walk", "log_rank_test",
        "lift_analysis", "cohort_ltv_curve",
        "duplicate_rate_by_source", "hll_sliding_distinct",
        "late_arrival_audit", "fulfillment_latency",
        "span_corruption", "moments_profile",
    }
    never_green = {n for n in q.REGISTRY if n not in green}
    missed_new = never_green - set(head) - deferred_to_r8
    assert not missed_new, f"never-green queries outside: {missed_new}"
    k = len(deferred_to_r8)
    assert list(q._CHECK_ORDER[50 : 50 + k]) == sorted(
        deferred_to_r8,
        key=list(q._CHECK_ORDER).index,
    ), "deferred queries must lead the r8 rotation (slots right after 50)"
