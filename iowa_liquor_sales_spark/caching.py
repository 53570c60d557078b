"""Session-wide registry of per-call persisted relations.

Round-10 added ~12 operator-internal ``.persist()`` calls (shared
subtrees that a self-join or multi-branch consumer would otherwise
re-evaluate — guide §5).  A ``DataFrame.persist()`` registers the plan
in the session's CacheManager, which holds a STRONG reference: without
an explicit ``unpersist()`` the cached relation lives until JVM death.
In a long-lived session that runs many queries (the external driver,
the sharded oracle sweep, one bench cohort JVM) those per-call pins
accumulate as executor-storage pressure — the round-10 verdict names
this as the likely root cause of the documented intra-JVM bench drift.

The contract here (round-11 verdict item 3):

- operators call :func:`pin` instead of bare ``.persist()``; semantics
  inside the query are identical (same storage level, same reuse);
- whoever materializes the query's output calls :func:`release_pinned`
  afterwards — ``__spark_entry__.queries()`` wraps every query callable
  to release the PREVIOUS query's pins on entry (by then the caller has
  materialized that query's result), ``bench.py`` releases after every
  timed rep, and the oracle harness releases after each comparison.

Releasing is always CORRECT regardless of timing: ``unpersist`` is a
hint, and a consumer that re-runs after release simply recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register for a later :func:`release_pinned`."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _PINNED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every relation pinned since the last release.

    Returns the number of relations released. Safe to call at any time:
    a consumer of a released relation recomputes it (persist/unpersist
    are hints, never correctness).
    """
    n = len(_PINNED)
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return n
