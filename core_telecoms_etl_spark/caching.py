"""Bounded, slot-scoped DataFrame caching.

Some operators legitimately pin an intermediate relation: two consumers
whose differing column pruning defeats canonicalized exchange reuse
(measured — see `queries/relational.py::important_stock`), or an
iterative/blocked algorithm that probes the same signature relation
repeatedly (`operators/dedup.py`). A bare `.cache()` inside such an
operator accumulates ONE pinned relation PER INVOCATION for the session
lifetime — in the engine's long-lived drivers (bench loops, the
160+-query oracle checker) that squeezes executor storage memory with
relations nobody will read again.

`cache_scoped(slot, df)` makes the pin bounded: each invocation
unpersists the PREVIOUS invocation's relation for the same slot (an
evicted cache is merely recomputed if an old handle is still consumed —
correctness never depends on it), and `release_caches()` drains every
slot for tools that sweep many queries in one session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED_CACHES: dict[str, DataFrame] = {}


def cache_scoped(slot: str, df: DataFrame) -> DataFrame:
    """Cache `df`, unpersisting whatever the slot pinned previously."""
    prev = _SCOPED_CACHES.get(slot)
    if prev is not None:
        prev.unpersist()
    cached = df.cache()
    _SCOPED_CACHES[slot] = cached
    return cached


def release_caches() -> int:
    """Unpersist every scoped cache; returns how many were released."""
    n = len(_SCOPED_CACHES)
    for df in _SCOPED_CACHES.values():
        df.unpersist()
    _SCOPED_CACHES.clear()
    return n
