"""Persist-lifecycle registry: track every cached DataFrame, release on demand.

Spark's ContextCleaner reclaims persisted RDDs only when unreferenced,
but DataFrame ``persist()`` registers the plan in the CacheManager,
which holds a reference until an explicit ``unpersist()``. A long-lived
driver that calls operators which persist intermediates (order-key
assignment, LSH candidate tables, …) therefore accumulates cached
blocks until eviction pressure.

Every operator in this package that persists an intermediate does so
through :func:`persist_tracked`; job entry points (``pipeline.run_extraction_job``,
the CLI, bench) call :func:`release_caches` once their terminal action
has materialized. Laziness is why the operators cannot unpersist
themselves: they return un-executed plans whose actions happen later,
in the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later release_caches()."""
    df.persist()
    _REGISTRY.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: plans referencing a released cache simply
    recompute their lineage on the next action.
    """
    released = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return released
