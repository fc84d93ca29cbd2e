"""Temporal operator tests: as-of join semantics (ties, no-match rows),
binned range join (bin-boundary spans, zero-match left rows)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 20, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(8)), (101, 10, _ts(10)), (102, 10, _ts(25))],
        "click_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.click_id
        for r in asof_join(
            left,
            right.select("user_id", "ts", "click_id"),
            on="user_id",
            right_cols=["click_id"],
        ).collect()
    }
    # equal timestamps match (>= semantics): event 1 at :10 takes click :10
    assert out[1] == 101
    assert out[2] == 102  # latest before :30 is :25
    assert out[3] is None  # user 20 has no clicks at all


def test_asof_join_keeps_left_row_count(spark, sf_dir):
    from core_telecoms_etl_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(left, right, on="user_id", right_cols=["click_id"])
    assert out.count() == left.count()


def test_range_join_binned_crosses_bin_boundary(spark):
    # left at :09:30, right at :19:00 — 9.5 min later, inside the 10-min
    # window but in the NEXT 10-minute bin: the ×2 bin fan-out must find it
    left = spark.createDataFrame(
        [(1, 10, _ts(9, 30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(50, 10, _ts(19, 0)), (51, 10, _ts(19, 31)), (52, 10, _ts(9, 30))],
        "event_id long, user_id long, ts timestamp",
    )
    out = range_join_binned(
        left, right, on="user_id", left_id="event_id", window_seconds=600
    ).collect()
    # 50 is in-window (next bin); 51 is 1s past the window; 52 is NOT
    # strictly after left.ts
    assert [r.r_event_id for r in out] == [50]


def test_range_join_binned_left_keeps_zero_match_rows(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 99, _ts(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(50, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    out = range_join_binned(
        left,
        right,
        on="user_id",
        left_id="event_id",
        window_seconds=600,
        how="left",
    ).collect()
    by_left = {r.l_event_id: r.r_event_id for r in out}
    assert by_left == {1: 50, 2: None}
    assert len(out) == 2  # no duplicate rows from the bin fan-out


def test_asof_join_directions_match_pandas_merge_asof(spark):
    """Property check vs pandas merge_asof on deterministic pseudo-random
    data: backward / forward / nearest, with and without tolerance, must
    agree row-for-row (including the ties-at-equal-ts and no-match
    cases)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n_l, n_r = 400, 300
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 8, n_l),
            "ts": rng.randint(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 8, n_r),
            "ts": rng.randint(0, 1000, n_r).astype("int64"),
            "v": rng.randint(0, 10**6, n_r).astype("int64"),
        }
    )
    # merge_asof requires unique (k, ts) on the right for exact parity of
    # WHICH row matches (the value at a duplicate ts is engine-arbitrary)
    right_pd = right_pd.drop_duplicates(["k", "ts"])
    left_df = spark.createDataFrame(left_pd)
    right_df = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50):
            expect = pd.merge_asof(
                left_pd.sort_values("ts", kind="stable"),
                right_pd.sort_values("ts", kind="stable"),
                on="ts",
                by="k",
                direction=direction,
                tolerance=tol,
            ).set_index("lid")["v"]
            got = asof_join(
                left_df,
                right_df,
                on="k",
                right_cols=["v"],
                direction=direction,
                tolerance=tol,
            ).collect()
            assert len(got) == n_l, direction
            for r in got:
                e = expect.loc[r.lid]
                g = r.v
                if pd.isna(e):
                    assert g is None, (direction, tol, r)
                else:
                    assert g == e, (direction, tol, r, e)


def test_time_grid_ffill_fills_gaps_in_order(spark):
    """Grid spans [first, last] bucket per key; gap buckets carry the
    last observed value forward with n_events=0; in-bucket ties resolve
    to the latest (ts, order) observation."""
    import datetime as dt

    from core_telecoms_etl_spark.operators.temporal import time_grid_ffill

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, 1, t(0), 10.0),
            (2, 1, t(1), 11.0),   # same bucket, later → wins
            (3, 1, t(31), 30.0),  # bucket 2 (15-min grid): gap at bucket 1
            (4, 2, t(5), 99.0),   # single-bucket key
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        (r.user_id, r.grid_ts.minute): (r.value_ffill, r.n_events)
        for r in time_grid_ffill(df).collect()
    }
    assert out[(1, 0)] == (11.0, 2)   # tie → later event
    assert out[(1, 15)] == (11.0, 0)  # gap: carried forward, zero events
    assert out[(1, 30)] == (30.0, 1)
    assert out[(2, 0)] == (99.0, 1)
    assert len(out) == 4


def test_time_grid_lerp_interpolates_between_observations(spark):
    """Gap buckets take the straight line between bracketing
    observations; observed buckets keep their exact value; the tail
    carries the last value forward."""
    import datetime as dt

    from core_telecoms_etl_spark.operators.temporal import time_grid_lerp

    t = lambda m: dt.datetime(2024, 1, 1, m // 60, m % 60)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, 1, t(0), 10.0),
            (2, 1, t(45), 40.0),   # 3 buckets later: two gap points
            (3, 1, t(61), 99.0),   # one more observed bucket, then end
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.grid_ts.hour * 60 + r.grid_ts.minute: r.value_lerp
        for r in time_grid_lerp(df).collect()
    }
    assert out[0] == 10.0
    assert out[15] == 20.0   # 1/3 of the way 10→40
    assert out[30] == 30.0   # 2/3
    assert out[45] == 40.0
    assert out[60] == 99.0
    assert len(out) == 5


def test_interarrival_stats_hand_gaps(spark, tmp_path):
    """Gaps of 10s and 30s: mean 20s, p50 20s (interpolated), p90 28s."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.temporal import interarrival_stats

    rows = [
        (1, 1, "2020-01-01 00:00:00", "click"),
        (2, 1, "2020-01-01 00:00:10", "click"),
        (3, 1, "2020-01-01 00:00:40", "click"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    row = interarrival_stats(spark, str(d)).collect()[0]
    assert row.n_gaps == 2
    assert row.mean_gap_s == 20.0
    assert row.p50_gap_s == 20.0
    assert row.p90_gap_s == 28.0


def test_late_arrival_audit_bucketed_prefix_max_matches_plain(spark):
    """The two-level bucketed high-water mark must equal the naive
    global window on the real table."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    out = {
        r.event_type: (r.n_events, r.n_late_1h)
        for r in e.queries()["late_arrival_audit"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    from core_telecoms_etl_spark.sources.readers import load_table

    # load_table, not a raw parquet read: the testdata timestamp
    # encoding needs normalize_timestamps (verify-skill gotcha)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = (
        ev.select(
            "event_type",
            F.unix_micros("ts").alias("tus"),
            F.max(F.unix_micros("ts")).over(w).alias("hw"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("tus") < F.col("hw") - F.lit(3600000000)).cast("int")
            )
            .cast("long")
            .alias("late"),
        )
    )
    assert out == {r.event_type: (r.n, r.late) for r in naive.collect()}


def test_late_arrival_audit_hand_case(spark, tmp_path):
    """An out-of-order event older than the 1h watermark is counted
    late; a slightly-late one is not."""
    from pyspark.sql import functions as F

    from core_telecoms_etl_spark.queries.temporal import late_arrival_audit

    rows = [
        (1, 1, "2020-01-01 10:00:00", "click"),
        (2, 1, "2020-01-01 12:00:00", "click"),  # advances high water
        (3, 1, "2020-01-01 10:30:00", "click"),  # 1.5h late -> dropped
        (4, 1, "2020-01-01 11:30:01", "click"),  # 0.99h late -> kept
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "star"
    ev.write.parquet(str(d / "events.parquet"))
    r = late_arrival_audit(spark, str(d)).collect()[0]
    assert r.n_events == 4
    assert r.n_late_1h == 1
