"""Event-time operator tests (SURVEY.md §2.10): tumbling windows,
sessionization semantics, and batch↔stream plan parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from core_telecoms_etl_spark.streaming.events import (
    run_stream_tumbling,
    sessionize,
    tumbling_agg,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_tumbling_agg_boundaries(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0), 1, "a", 1.0),
            (2, _ts(14, 59), 1, "a", 2.0),  # same 15-min window
            (3, _ts(15), 1, "a", 4.0),  # next window
        ],
    )
    out = {
        (r.window_start.minute, r.event_type): (r.n_events, r.value_sum)
        for r in tumbling_agg(ev, "15 minutes").collect()
    }
    assert out[(0, "a")] == (2, 3.0)
    assert out[(15, "a")] == (1, 4.0)


def test_sessionize_gap_splits(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0), 7, "a", 1.0),
            (2, _ts(10), 7, "a", 1.0),  # same session (gap 10m < 30m)
            (3, _ts(50), 7, "a", 1.0),  # new session (gap 40m)
            (4, _ts(0), 8, "a", 1.0),  # other user: own session
        ],
    )
    out = sessionize(ev, gap_seconds=1800).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[7]) == 2
    sessions = sorted(per_user[7], key=lambda r: r.session_id)
    assert sessions[0].n_events == 2 and sessions[0].duration_sec == 600.0
    assert sessions[1].n_events == 1 and sessions[1].duration_sec == 0.0
    assert len(per_user[8]) == 1


def test_sessionize_exact_gap_is_same_session(spark):
    ev = _events(
        spark, [(1, _ts(0), 1, "a", 1.0), (2, _ts(30), 1, "a", 1.0)]
    )
    out = sessionize(ev, gap_seconds=1800).collect()
    assert len(out) == 1  # gap == threshold: not greater → same session


def test_stream_matches_batch(spark, sf_dir):
    """The streaming plan over the same files produces the same result as
    the batch plan (complete-mode memory sink)."""
    from core_telecoms_etl_spark.sources.readers import load_table

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in tumbling_agg(
            load_table(spark, sf_dir, "events"), "15 minutes"
        ).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in run_stream_tumbling(
            spark, f"{sf_dir}/events.parquet", width="15 minutes",
            query_name="test_stream_out",
        ).collect()
    }
    assert streamed == batch


def test_stateful_totals_match_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.sources.readers import load_table
    from core_telecoms_etl_spark.streaming.events import run_stream_stateful

    got = {
        r.user_id: (r.n_events, r.value_sum)
        for r in run_stream_stateful(
            spark, f"{sf_dir}/events.parquet", query_name="t_stateful"
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.value_sum)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .collect()
    }
    assert got == want
