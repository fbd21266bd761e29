"""Scale-adaptive scan re-spread for CPU-heavy fan-out passes.

The corpus fixtures arrive as ONE parquet row group per table, so a scan
is one task no matter the session's core count — and a row group cannot
be split, so ``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum``
cannot help.  Operators whose first pass fans the scan out 100-1000×
in CPU terms (shingling, n-gram hashing, trigram packing, per-word DP)
therefore ran single-threaded end-to-end (guide §2.5 "input skew: one
huge unsplittable file — repartition immediately after the read";
measured: the dedup_ngram_jaccard bigram build was a 0.7 s one-task
job on a 32-core session, the kn-trigram pack two 0.66 s one-task jobs).

:func:`spread_fanout` inserts a round-robin repartition to the session's
default parallelism ONLY when the scan is materially narrower than the
session — on any production layout (many files / many row groups /
many-way scans) it is a structural no-op, so this is the §2.5 fix
parameterised by the measured scan width, not a local-mode constant.

Correctness: round-robin repartition is deterministic (Spark sorts
within the input partition before redistributing — SPARK-23207) and the
call sites are restricted to operators whose downstream math is
partition-order independent (integer/hash aggregates, MIN/MAX, per-row
exact expressions).  Operators carrying order-sensitive double
aggregations must not route through this helper; every adopting
operator re-verifies against the DuckDB oracle (exact float reprs) at
three SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_fanout(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the session's default parallelism when
    its current plan would execute in far fewer partitions.

    The 4× margin means a scan already within a small factor of the
    session width is left untouched (repartition would buy little and
    costs an exchange of the scan's rows); the narrow-fixture case
    (1 partition vs 32+ cores) always triggers."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n * 4 <= target:
        return df.repartition(target)
    return df
