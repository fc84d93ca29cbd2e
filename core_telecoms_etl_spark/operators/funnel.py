"""Funnel analysis in a single shuffle (capability extension).

The staged formulation (stage k = min qualifying ts after stage k-1's)
re-joins the event table once per stage and recomputes the upstream
chain. This operator does the whole funnel in ONE shuffle: group events
by user collecting each stage's timestamps as its own sorted array
(`collect_list` under a type predicate — map-side combined), then chain
t₁ = min(stage₁ ts), tᵢ = min{t ∈ stageᵢ ts : t > tᵢ₋₁} with pure-JVM
`array_min`/`filter` expressions. Per-user work is O(events log events)
for the sorts; no re-scans, no repeated joins, and the single exchange
is on the natural key. (An earlier version folded one sorted
(ts, type) array through an `aggregate` lambda — the per-stage-array
form computes the same greedy earliest-completion chain with k small
array scans instead of an O(events·k) fold that reallocates the state
array per event.)
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
    horizon_seconds: int | None = None,
) -> DataFrame:
    """(user, stage_ts: array<timestamp>[k]) — stage_ts[i] is when the
    user completed stage i (NULL onward from the first uncompleted
    stage): the greedy earliest-completion chain, each stage strictly
    after the previous one.

    With ``horizon_seconds``, each stage must ALSO land within that
    many seconds of the previous stage's completion (conversion
    window). Semantics are greedy-from-earliest — stage i is the
    earliest qualifying event after the chain's stage i-1 time, NOT
    the best chain over all stage-1 anchors — documented because
    windowed-funnel semantics differ across tools."""
    per_user = (
        events.filter(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(
            *[
                F.sort_array(
                    F.collect_list(
                        F.when(F.col(type_col) == s, F.col(ts_col))
                    )
                ).alias(f"__ts_{i}")
                for i, s in enumerate(stages)
            ]
        )
    )
    def _after(prev: Column):
        # x > NULL is NULL → filter drops everything → NULL onward
        if horizon_seconds is None:
            return lambda x: x > prev
        bound = prev + F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        return lambda x: (x > prev) & (x <= bound)

    stage_ts: list[Column] = []
    for i in range(len(stages)):
        if i == 0:
            t = F.array_min(f"__ts_{i}")
        else:
            t = F.array_min(F.filter(f"__ts_{i}", _after(stage_ts[i - 1])))
        stage_ts.append(t)
    return per_user.select(
        user_col, F.array(*stage_ts).alias("stage_ts")
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """One row: the number of users completing each funnel prefix."""
    times = user_funnel_times(
        events,
        stages,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        horizon_seconds=horizon_seconds,
    )
    # coalesce: SUM over an empty user relation is NULL, but a funnel
    # over no users completed 0 prefixes (oracle counts 0) — r8
    # empty-facts differential
    aggs = [
        F.coalesce(
            F.sum(
                F.when(
                    F.element_at("stage_ts", i + 1).isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias(f"n_{'_'.join(stages[: i + 1])}")
        for i in range(len(stages))
    ]
    return times.agg(*aggs)
