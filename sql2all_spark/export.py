"""One-call export API — the reference's whole CLI surface as one function.

Reference flow (``src/main.rs:24-31``): parse url → dispatch source by scheme
(``src/lib.rs:47-65``) → run SQL on source → dispatch sink by output file
extension (``src/lib.rs:76-90``) → stream result to Parquet/CSV/NDJSON
(``src/lib.rs:92-141``).  Here the same contract is
``export(spark, url, query, output)`` where the heavy lifting is
``spark.read`` + Catalyst + ``df.write``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql2all_spark.sinks import write_output
from sql2all_spark.sources import read_source


def export(
    spark: SparkSession,
    url: str,
    query: str,
    output: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    single_file: bool = False,
    read_options: dict[str, str] | None = None,
    write_options: dict[str, str] | None = None,
) -> DataFrame:
    """Execute ``query`` against the source at ``url`` and write the result
    to ``output`` in the format implied by its extension.

    ``read_options`` go only to the source reader and ``write_options`` only
    to the sink writer — many option names are shared between Spark readers
    and writers (``header``, ``sep``, ``nullValue``, ``compression``, ...),
    so a single merged dict would silently reconfigure both layers (e.g. a
    ``sep=';'`` meant for CSV *output* also changing how a CSV *source* is
    parsed).

    Unlike the reference's single-cursor/single-writer pipeline
    (``src/db/sqlite.rs:84-96``: 1-row batches through an mpsc(100) channel),
    the read, the query, and the write are all distributed: partitioned JDBC
    or parquet scan → Catalyst plan → parallel committed writers.

    Returns the result DataFrame (also useful for embedded/library use, the
    analogue of the reference's public ``Database`` API, ``src/lib.rs:26``).
    """
    df = read_source(spark, url, query, **(read_options or {}))
    write_output(
        df,
        output,
        mode=mode,
        partition_by=partition_by,
        cluster_by=cluster_by,
        single_file=single_file,
        **(write_options or {}),
    )
    return df
