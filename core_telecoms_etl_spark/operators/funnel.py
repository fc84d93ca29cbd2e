"""Funnel analysis as a single-shuffle fold (capability extension).

The staged formulation (stage k = min qualifying ts after stage k-1's)
re-joins the event table once per stage and recomputes the upstream
chain. This operator does the whole funnel in ONE shuffle: group events
by user, sort each user's (ts, type) list, and fold it through the stage
chain with a pure-JVM `aggregate` expression — the state is the array of
per-stage completion timestamps, and an event advances the funnel iff it
matches the next stage's type and is strictly later than the previous
stage's completion. Per-user work is O(events); no re-scans, no repeated
joins, and the single exchange is on the natural key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def user_funnel_times(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, stage_ts: array<timestamp>[k]) — stage_ts[i] is when the
    user completed stage i (NULL onward from the first uncompleted
    stage)."""
    k = len(stages)
    stage_types = F.array(*[F.lit(s) for s in stages])
    per_user = events.filter(
        F.col(type_col).isin(stages)
    ).groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col), F.col(type_col)))
        ).alias("__evs")
    )

    def step(acc: Column, ev: Column) -> Column:
        # n_done = completed stages so far; advance iff ev matches the
        # next stage and strictly follows the previous stage's completion
        n_done = F.size(F.filter(acc, lambda t: t.isNotNull()))
        next_type = F.element_at(stage_types, n_done + 1)
        prev_ts = F.when(
            n_done == 0, F.lit(None).cast("timestamp")
        ).otherwise(F.element_at(acc, n_done))
        advance = (
            (n_done < k)
            & (ev[type_col] == next_type)
            & ((n_done == 0) | (ev[ts_col] > prev_ts))
        )
        return F.when(
            advance,
            F.transform(
                acc,
                lambda t, i: F.when(i == n_done, ev[ts_col]).otherwise(t),
            ),
        ).otherwise(acc)

    init = F.array_repeat(F.lit(None).cast("timestamp"), k)
    return per_user.select(
        user_col, F.aggregate("__evs", init, step).alias("stage_ts")
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row: the number of users completing each funnel prefix."""
    times = user_funnel_times(
        events, stages, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    aggs = [
        F.sum(
            F.when(
                F.element_at("stage_ts", i + 1).isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"n_{'_'.join(stages[: i + 1])}")
        for i in range(len(stages))
    ]
    return times.agg(*aggs)
