"""Bounded-lifetime DataFrame caching, shared by every operator that
persists an intermediate feeding multiple consumers (kNN top-k,
duplicate summaries, dedup shingles, phash signatures, DBSCAN pair
tables, zonal decode stats).

The policy: a cached intermediate must outlive its own call (the
returned DataFrame reads it), so it cannot be unpersisted on exit —
instead each NEW call evicts the PREVIOUS call's cache.  Repeated
bench/parity/CLI invocations in one JVM therefore hold at most one
generation of blocks per operator instead of accumulating
session-lifetime storage.

Eviction is defensive: the previous DataFrame may belong to a
SparkSession that has since been stopped (parity session → bench
session in one driver process), where `unpersist` raises through Py4J;
its blocks died with the context, so the failure is swallowed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def make_bounded_cache() -> Callable[[DataFrame], DataFrame]:
    """Return a per-operator cache slot: ``bound(df)`` evicts the slot's
    previous occupant (ignoring stopped-session errors), caches ``df``
    (MEMORY_AND_DISK, same as ``persist()``'s default) and returns it."""
    slot: list[DataFrame] = []

    def bound(df: DataFrame) -> DataFrame:
        while slot:
            prev = slot.pop()
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # previous session stopped; its blocks are already gone
        df = df.cache()
        slot.append(df)
        return df

    return bound
