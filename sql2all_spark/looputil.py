"""Scale-adaptive shuffle width for driver-loop operators.

The iterative operators (star contraction, label propagation, EM/prune
and codebook training loops) run many small Spark jobs over slim,
bounded frames.  Each round's shuffles start at the session-wide
``spark.sql.shuffle.partitions`` (2×cores by default) and rely on AQE to
coalesce — correct, but the per-round fixed cost (map-status tracking,
AQE re-planning over 64 shuffle blocks, task scheduling) dominates when
the frame is a few thousand rows: measured on a 4k-edge graph, 12 star
rounds cost 5.9s at 64 initial partitions vs 3.8s at 8, identical
results (OPTIMIZATION_r16.md).

:func:`loop_shuffle_partitions` derives the loop's INITIAL shuffle
width from the measured size of the loop's input instead (guide §2:
partitioning derived from input size, never a constant tuned for one
deployment), sets it for the duration of the loop, and restores the
session value afterwards:

    partitions = clamp(ceil(rows / rows_per_partition), floor, session)

- ``rows_per_partition`` defaults to 4M slim rows (~64 MB of 16-byte
  edge rows — the guide §2.2 100 MB-1 GB band's low end, right for
  frames that are re-shuffled every round).
- The result is CAPPED at the session value: on a cluster where the
  input is genuinely large, the loop keeps the session's width and this
  is a no-op.  It only ever narrows small loops, never widens big ones.
- AQE stays on — it still coalesces below the initial width and splits
  skew.

The conf is session-global while set; every shipped runner (driver
gate, check.py, bench.py) builds and executes queries one at a time on
one thread, and the restore is in ``finally``.  Streaming jobs never
run inside these loops.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

LOOP_ROWS_PER_PARTITION = 4_000_000
LOOP_MIN_PARTITIONS = 8

# Below this measured input size the loop also runs with AQE OFF: AQE
# materializes every exchange as its own job to re-plan, which turns one
# logical round over a few-thousand-row frame into 4-6 scheduler round
# trips (measured: text_template_mining ran 64 jobs for ~10 star rounds,
# ~4 s of driver gaps against 1.5 s of executor work).  One partition's
# worth of rows is the natural cutoff: at or below it there is nothing
# for AQE to coalesce and no skew to split, above it (cluster-scale
# frames) AQE keeps its value and stays on.
LOOP_AQE_OFF_ROWS = LOOP_ROWS_PER_PARTITION


@contextmanager
def loop_shuffle_partitions(
    materialized: DataFrame,
    rows_per_partition: int = LOOP_ROWS_PER_PARTITION,
) -> Iterator[int]:
    """Scope the session's shuffle width to one derived from
    ``materialized``'s row count (the frame must already be persisted or
    checkpointed — the count is then a cheap cached-block scan, not a
    recompute).  Yields the width chosen."""
    spark = materialized.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    session_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    n_rows = materialized.count()
    derived = max(
        LOOP_MIN_PARTITIONS,
        -(-n_rows // rows_per_partition),  # ceil div
    )
    parts = min(session_parts, derived)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    if n_rows <= LOOP_AQE_OFF_ROWS:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield parts
    finally:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(session_parts)
        )
        spark.conf.set("spark.sql.adaptive.enabled", session_aqe)
