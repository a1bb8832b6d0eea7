"""Cache lifecycle for operators that persist intermediates.

Operators like MinHash/SimHash/hyperplane-LSH persist a mid-pipeline
frame that the returned (lazy) DataFrame consumes twice. The persist is
load-bearing — without it the expensive signature stage runs once per
consumer — but a long-lived session that calls the operator repeatedly
would accumulate cached blocks until the executor storage pool evicts or
OOMs. Eagerly unpersisting inside the operator is not an option: the
result is lazy, and forcing an action there would both double-execute
and collapse the plan the tests assert on.

Contract instead: the operator tags its result with the persisted
dependencies (``register_cached``); whoever runs the action calls
``release_cached(result)`` afterwards (bench and the engine do). Callers
that skip this fall back to Spark's LRU storage eviction — correct, just
not prompt — or can ``spark.catalog.clearCache()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_graft_cached_deps"


def register_cached(result: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Tag ``result`` with persisted frames it depends on."""
    existing = list(getattr(result, _ATTR, []))
    setattr(result, _ATTR, existing + list(deps))
    return result


def release_cached(result: DataFrame, blocking: bool = False) -> None:
    """Unpersist every dependency tagged on ``result``. Call AFTER the
    result has been materialized (collect/count/write) — unpersisting
    earlier just forces the cached stage to recompute."""
    for dep in getattr(result, _ATTR, []):
        dep.unpersist(blocking)
    setattr(result, _ATTR, [])
