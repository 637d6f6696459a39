"""Driver-side plan-fragment cache for per-micro-batch fixed costs.

Streaming (link_batch) rebuilds the same logical plan every micro-batch;
the SQL *strings* were already memoized (match._staged_plan_sql), but the
Column objects — the parsed/constructed JVM expression trees — were
rebuilt each call, and profiling showed them to be the dominant
driver-serial cost per batch (the blocking key-entries array ~0.5 s per
build, the staged rule expressions ~1 s, the prep clean cascade ~0.6 s).
Unresolved Column expressions are immutable and carry no plan or session
state, so they are safely reusable across DataFrames and across
SparkSessions within one JVM gateway.

The cache is keyed on the py4j gateway identity: if the process ever
launches a fresh JVM (new gateway), stale JVM object handles are
discarded instead of raising Py4JError.
"""
from __future__ import annotations

from typing import Any, Callable

_cache: dict = {}


def _gateway_key():
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return id(sc._gateway) if sc is not None else None


def cached_fragment(key: Any, builder: Callable[[], Any]) -> Any:
    """Return ``builder()`` memoized per (key, live JVM gateway)."""
    gk = _gateway_key()
    ent = _cache.get(key)
    if ent is not None and ent[0] == gk:
        return ent[1]
    val = builder()
    _cache[key] = (gk, val)
    return val
