"""Persisted-intermediate tracking for query builders.

Several builders ``persist()`` slim intermediates (signature tables, edge
lists, pre-aggregations) because multiple branches of the same plan re-read
them — without the persist Catalyst re-derives the lineage per consumer and
rescans the base table (NOTES "self-joins recompute their lineage per
side").  The cost is that the cached blocks outlive the query: a runner
that executes many queries in one session (the driver's correctness gate,
``tools/check.py`` across ~130 queries at sf1) accumulates them until the
single local-mode JVM heap fills — the exact OOM the round-7 sf1 soak hit.

``check.py`` and ``bench.py`` already ``clearCache()`` between queries;
this module closes the remaining gap (ADVICE r7: the driver gate has no
such hook) without requiring every runner to know about caching:

- builders persist through :func:`persist_tracked` instead of raw
  ``.persist()``;
- :func:`release_tracked` unpersists everything tracked so far, and the
  registry calls it at the START of every builder invocation — by the time
  the next query is built, the previous query's result has been consumed,
  so its intermediates are dead weight.

Releasing is always CORRECTNESS-safe: ``unpersist`` never invalidates a
DataFrame, it only drops the cached blocks (a consumer that still holds the
plan recomputes it).  Streaming jobs that pin a corpus across micro-batches
use raw ``.persist()`` deliberately and are not tracked here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()``, recorded for later bulk release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every DataFrame recorded by :func:`persist_tracked`.

    Safe to call at any time (double-unpersist is a no-op; unpersisting a
    plan that never ran is a no-op)."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
