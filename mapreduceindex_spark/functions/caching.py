"""Tracked persistence for caches whose consumer is a RETURNED lazy plan.

Some operators (``dedup.dup_spans``, ``multimodal.media_dhash_near_dups``)
persist an intermediate frame that multiple branches of the *returned*
plan scan; no action runs inside the builder, so an unpersist-before-
return would undo the cache before it ever materialized. Left alone, each
invocation leaks its cached blocks for the life of the session (the r03
advisor flagged exactly this accumulation).

``track`` registers such a frame; the next ``release()`` — called at the
top of every operator that uses the pattern, and available to entry
layers after they materialize results — unpersists everything tracked.
The leak is thereby bounded to the single most recent invocation instead
of growing without bound in a long-lived session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for deferred release."""
    _LIVE.append(df)
    return df


def release() -> None:
    """Unpersist every tracked frame (non-blocking; safe to call twice)."""
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
