"""Tracked persistence for caches whose consumer is a RETURNED lazy plan.

Some operators (``dedup.dup_spans``, ``multimodal.media_dhash_near_dups``,
``inverted_index.index_delete``) persist an intermediate frame that
multiple branches of the *returned* plan scan; no action runs inside the
builder, so an unpersist-before-return would undo the cache before it
ever materialized. Left alone, each invocation leaks its cached blocks
for the life of the session (the r03 advisor flagged exactly this
accumulation).

``track(df, key)`` registers such a frame under the OWNING OPERATOR's
key; the operator calls ``release(key)`` at its own entry, so a repeat
invocation frees its predecessor's cache while caches belonging to
OTHER operators — possibly backing plans built but not yet materialized
— are left untouched (a global single-slot registry would void operator
A's pending cache the moment operator B's plan was merely *built*).
``release()`` with no key frees everything — for entry layers after all
results materialize, and for tests. Live caches are thereby bounded to
one per tracked operator instead of growing without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def track(df: DataFrame, key: str) -> DataFrame:
    """Register an already-persisted frame under its operator key."""
    _LIVE.setdefault(key, []).append(df)
    return df


def release(key: str | None = None) -> None:
    """Unpersist tracked frames — one operator's (``key``) or all
    (``None``). Non-blocking; safe to call twice."""
    keys = [key] if key is not None else list(_LIVE)
    for k in keys:
        for df in _LIVE.pop(k, []):
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
