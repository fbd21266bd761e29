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
