"""Operation metrics via Spark's Observation API (SURVEY.md §2.4 A2).

The reference tallies processed/success/failed/skipped per operation with
driver-side counters (plugins/utilities.py:25-46,
plugins/customerload.py:148-177). On Spark, metrics piggyback on the job
itself: `df.observe(...)` attaches named aggregates that are computed
DURING the action — no second pass over the data, no driver-side loops —
which is the only affordable way to count at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ObservedFrame:
    """A DataFrame with an attached Observation. Run any action on `df`,
    then read `metrics` (blocks until the action finishes)."""

    df: DataFrame
    observation: Observation

    @property
    def metrics(self) -> dict:
        return dict(self.observation.get)


def observe_counts(
    df: DataFrame,
    *,
    name: str = "load_metrics",
    not_null_col: str | None = None,
) -> ObservedFrame:
    """Attach row-count (+ optional null-key count) metrics to a plan.
    The counts come for free with whatever action the caller runs."""
    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if not_null_col is not None:
        aggs.append(
            F.sum(
                F.when(F.col(not_null_col).isNull(), 1).otherwise(0)
            ).alias(f"n_null_{not_null_col}")
        )
    return ObservedFrame(df=df.observe(obs, *aggs), observation=obs)
