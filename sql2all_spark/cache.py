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


def checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Materialize ``df`` AND truncate its Catalyst lineage at a stage
    boundary — for composed pipelines whose downstream plan would
    otherwise repeat the entire upstream chain inside every
    InMemoryRelation (guide §3.3: "materialising an intermediate result
    truncates the plan"; §5 localCheckpoint).

    A ``materialize_tracked`` frame executes once, but every downstream
    action still ANALYZES and OPTIMIZES the full composed logical tree
    (the cached plan rides along inside the InMemoryRelation), and AQE
    re-plans each of its exchanges as a job.  On a many-stage
    composition (pipeline_pretrain_funnel: strip chain + star loop +
    scoring + domain assignment + two window passes ≈ a 0.8 MB physical
    plan) that planning/scheduling floor dominates the query
    (VERDICT r16 #1).  Checkpointing instead makes Catalyst see a LEAF
    relation: the stage executes exactly once (same cost as the
    materialize count) and every downstream plan is a scan.

    Storage policy follows graph._truncate_lineage: a session with a
    reliable checkpoint dir configured gets a real checkpoint
    (executor-decommission-safe); otherwise (local mode, tests)
    ``localCheckpoint(eager=True)``.  Checkpointed blocks are NOT in the
    tracked release list — they are owned by the RDD and are cleaned by
    the ContextCleaner when the RDD is GC'd (measured r16: no
    BlockManager growth across repeated runs of checkpointing loop
    operators)."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint()
    return df.localCheckpoint(eager=True)


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
