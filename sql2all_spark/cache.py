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

Contract (ADVICE r8): tracking is PER-THREAD.  The registry releases the
previous query's pins at the start of every builder call, which assumes the
build-then-execute-immediately pattern every shipped runner follows (driver
gate, check.py, bench.py).  A runner that builds several queries before
executing any of them keeps only the LAST query's pins warm — correct but
slower, the earlier branches recompute.  Thread-local storage means
concurrent builders (parallel bench, notebook threads) cannot release each
other's pins; each thread manages its own list.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _tracked() -> list[DataFrame]:
    lst = getattr(_LOCAL, "tracked", None)
    if lst is None:
        lst = _LOCAL.tracked = []
    return lst


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()``, recorded (per-thread) for later bulk release."""
    df.persist()
    _tracked().append(df)
    return df


def materialize_tracked(df: DataFrame) -> DataFrame:
    """:func:`persist_tracked` plus eager materialization (one ``count``
    action) — for persisted frames consumed by SEVERAL broadcast-exchange
    builds of the same query.

    Spark materializes every BroadcastExchange on a separate thread as
    soon as the consuming job is submitted; a lazily-persisted frame in
    those subtrees is not cached yet when the builds start, so each build
    recomputes the full lineage instead of reading blocks (concurrent
    tasks computing the same InMemoryRelation partition do not wait for
    each other).  Measured on text_template_strip: the 32-task gram-hash
    scan stage ran 11× inside broadcast builds, 21.6s of a 43s wall.
    Populating the cache with one count action first makes every
    subsequent build a cache read (guide §3.1 "compute/cache the small
    side first", §5).  Only worth it at fan-out sites — a frame whose
    consumers run sequentially pays the count for nothing."""
    df.persist()
    _tracked().append(df)
    df.count()
    return df


def release_tracked() -> None:
    """Unpersist every DataFrame recorded by :func:`persist_tracked` on
    THIS thread.

    Safe to call at any time (double-unpersist is a no-op; unpersisting a
    plan that never ran is a no-op)."""
    lst = _tracked()
    while lst:
        df = lst.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
